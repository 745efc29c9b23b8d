"""Process/thread-parallel map with per-item exception capture.

Parity with reference `common/parallel_util.py:36-74` (dask bag replaced by
stdlib concurrent.futures; same error-capturing DataFrame contract:
columns [result, error, stack_trace], optional index preservation).
"""
from __future__ import annotations

import multiprocessing
import traceback

import pandas as pd


def interpret_num_workers(num_workers: int) -> int:
    if num_workers < 1:
        return multiprocessing.cpu_count()
    return num_workers


def _safe_call(func, x):
    try:
        return {"result": func(x), "error": None, "stack_trace": None}
    except Exception as e:  # noqa: BLE001 — per-item capture is the contract
        return {"result": None, "error": e,
                "stack_trace": traceback.format_exc()}


def parallel_map(func, sequence, num_workers: int = -1,
                 include_input: bool = False,
                 preserve_index: bool = True) -> pd.DataFrame:
    num_workers = interpret_num_workers(num_workers)
    input_sequence = list(sequence)

    if num_workers == 1 or len(input_sequence) <= 1:
        output = [_safe_call(func, x) for x in input_sequence]
    else:
        # threads, not processes: metric funcs are numpy/scipy (GIL-released)
        # and closures over zarr groups don't pickle; on the 1-core hosts
        # this matches the reference's throughput anyway.
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=num_workers) as ex:
            output = list(ex.map(lambda x: _safe_call(func, x),
                                 input_sequence))

    index = None
    if isinstance(sequence, pd.Series) and preserve_index:
        index = sequence.index
    df = pd.DataFrame(output, columns=["result", "error", "stack_trace"],
                      index=index)
    if include_input:
        df["input"] = input_sequence
    return df
