"""parallel_map: fork process pool with closure support and per-item
exception capture (reference common/parallel_util.py contract)."""
import multiprocessing

import numpy as np
import pandas as pd
import pytest

from garmentnets_tpu.harness.parallel_util import parallel_map

has_fork = "fork" in multiprocessing.get_all_start_methods()


def test_serial_and_error_capture():
    def f(x):
        if x == 2:
            raise ValueError("boom")
        return x * 10

    df = parallel_map(f, [1, 2, 3], num_workers=1)
    assert df.result.iloc[0] == 10 and df.result.iloc[2] == 30
    assert pd.isna(df.result.iloc[1])  # numeric column: None -> NaN
    assert isinstance(df.error.iloc[1], ValueError)
    assert "boom" in df.stack_trace.iloc[1]


@pytest.mark.skipif(not has_fork, reason="fork unavailable")
def test_process_pool_with_closure():
    scale = np.asarray([3.0])  # closed-over numpy state (like zarr groups)

    def f(x):
        if x < 0:
            raise RuntimeError("negative")
        return float(x * scale[0])

    df = parallel_map(f, [1.0, -1.0, 2.0, 4.0], num_workers=2,
                      mode="process")
    assert (df.result.iloc[0], df.result.iloc[2], df.result.iloc[3]) \
        == (3.0, 6.0, 12.0)
    assert pd.isna(df.result.iloc[1])
    assert isinstance(df.error.iloc[1], RuntimeError)
    assert "negative" in df.stack_trace.iloc[1]


def test_series_index_preserved():
    s = pd.Series([5, 6], index=["a", "b"])
    df = parallel_map(lambda x: x + 1, s, num_workers=1)
    assert list(df.index) == ["a", "b"]
    assert list(df.result) == [6, 7]
