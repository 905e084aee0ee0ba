"""BlockManager semantics, native C++ backend vs Python fallback."""

import numpy as np
import pytest

from micromix_tpu.serve.block_manager import (
    BlockManager, native_kvpool_available)

BACKENDS = [False] + ([True] if native_kvpool_available() else [])


@pytest.fixture(params=BACKENDS, ids=lambda n: "native" if n else "python")
def backend(request):
    return request.param


def test_basic_alloc_release(backend):
    bm = BlockManager(n_pages=9, page_size=4, max_seqs=2,
                      max_pages_per_seq=4, use_native=backend)
    assert bm.is_native == backend
    assert bm.num_free == 8  # page 0 reserved

    row = bm.ensure(0, 10)           # ceil(10/4) = 3 pages
    assert bm.num_pages(0) == 3 and bm.num_free == 5
    assert (row[:3] > 0).all() and (row[3:] == 0).all()
    assert len(set(row[:3])) == 3

    # idempotent for covered lengths
    row2 = bm.ensure(0, 12)
    np.testing.assert_array_equal(row, row2)

    bm.release(0)
    assert bm.num_pages(0) == 0 and bm.num_free == 8


def test_lifo_reuse(backend):
    bm = BlockManager(n_pages=9, page_size=4, max_seqs=2,
                      max_pages_per_seq=8, use_native=backend)
    row = bm.ensure(0, 8)
    first = list(row[:2])
    bm.release(0)
    row2 = bm.ensure(1, 8)
    assert list(row2[:2]) == first[::-1]  # LIFO: freed pages reused first


def test_exhaustion_atomic(backend):
    bm = BlockManager(n_pages=5, page_size=4, max_seqs=2,
                      max_pages_per_seq=8, use_native=backend)
    bm.ensure(0, 12)  # 3 of 4 pages
    free_before = bm.num_free
    with pytest.raises(RuntimeError):
        bm.ensure(1, 12)  # needs 3, only 1 left
    assert bm.num_free == free_before  # all-or-nothing
    assert bm.num_pages(1) == 0
    bm.ensure(1, 4)  # the single remaining page still allocatable


def test_per_seq_cap(backend):
    bm = BlockManager(n_pages=64, page_size=4, max_seqs=1,
                      max_pages_per_seq=2, use_native=backend)
    with pytest.raises(RuntimeError):
        bm.ensure(0, 12)


def test_native_builds():
    # the toolchain is baked into the image; the native path must exist
    assert native_kvpool_available(), "libkvpool.so failed to build"
