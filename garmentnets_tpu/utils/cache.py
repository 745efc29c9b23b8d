"""mtime-validated pickle cache keyed by md5 of the target path.

Parity with reference `common/cache.py:5-31` (file_attr_cache): used to cache
the zarr attrs scan (groups_df) across runs.
"""
from __future__ import annotations

import hashlib
import pathlib
import pickle


def file_attr_cache(target_file, cache_dir="~/.cache/garmentnets_tpu"):
    cache_dir_path = pathlib.Path(cache_dir).expanduser()
    target_file_path = pathlib.Path(target_file).expanduser()
    assert target_file_path.exists()
    target_key = hashlib.md5(
        str(target_file_path.absolute()).encode()).hexdigest()

    def decorator(func):
        def wrapped(*args, **kwargs):
            cache_dir_path.mkdir(parents=True, exist_ok=True)
            cache_file_path = cache_dir_path / target_key
            if cache_file_path.exists():
                target_time = target_file_path.stat().st_mtime
                cache_time = cache_file_path.stat().st_mtime
                if target_time < cache_time:
                    with cache_file_path.open("rb") as f:
                        return pickle.load(f)
            obj = func(*args, **kwargs)
            with cache_file_path.open("wb") as f:
                pickle.dump(obj, f)
            return obj
        return wrapped
    return decorator
