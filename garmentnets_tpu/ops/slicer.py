"""Chunked iteration over large dense grids.

Parity with reference `components/gridding.py:262-298` (`ArraySlicer`): yields
slice tuples covering `shape` in `chunks`-sized blocks, row-major. Used by the
predict harness to stream the 128^3 (or 256^3) WNF query grid through the
implicit decoder in fixed-size device programs; on multi-device meshes the
chunk list is the unit of spatial sharding.
"""
from __future__ import annotations

import numpy as np


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class ArraySlicer:
    def __init__(self, shape: tuple, chunks: tuple):
        assert len(chunks) <= len(shape)
        relevant_shape = tuple(shape[: len(chunks)])
        chunk_count = tuple(ceil_div(s, c) for s, c in zip(relevant_shape, chunks))
        self.relevant_shape = relevant_shape
        self.chunks = tuple(chunks)
        self.chunk_count = chunk_count

    def __len__(self) -> int:
        return int(np.prod(self.chunk_count))

    def __getitem__(self, idx: int):
        stride = np.cumprod((self.chunk_count[1:] + (1,))[::-1])[::-1]
        slices = []
        mod = idx
        for dim, s in enumerate(stride):
            ci = mod // s
            mod = mod % s
            start = self.chunks[dim] * ci
            end = min(self.relevant_shape[dim], self.chunks[dim] * (ci + 1))
            slices.append(slice(int(start), int(end)))
        return slices

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
