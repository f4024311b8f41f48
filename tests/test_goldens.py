"""Golden-value tests transcribed from the reference test suite
(reference tests/main.rs:12-90).  These literal values are the bit-identity
oracle for the whole framework."""

import numpy as np
import pytest

from rust_seq2kminmers_tpu.api import KminmersIterator, kminmers_list
from rust_seq2kminmers_tpu.oracle import HashMode, kminmers as oracle_kminmers

# Golden k-min-mer hashes for KminmersIterator(l=10, k=5, d=0.0001, Regular)
# with the active H=u32 configuration (reference tests/main.rs:41-57).
GOLDEN_HASHES_U32 = [
    143479479014703,
    1415094313937202,
    7085699921625713,
    2731023262850893,
    3529660833839258,
    2520689800435504,
    3515165585325381,
    2855190423625803,
    5122855536061684,
    244022361441902,
    2856446528761135,
    906939906227534,
    2115341643533671,
    246274980452770,
    159737436030657,
]


def test_oracle_goldens(ecoli_seq):
    recs = oracle_kminmers(ecoli_seq, 10, 5, 0.0001, HashMode.Regular)
    assert [r.hash for r in recs] == GOLDEN_HASHES_U32


def test_jax_pipeline_goldens(ecoli_seq):
    recs = kminmers_list(ecoli_seq, 10, 5, 0.0001, HashMode.Regular)
    assert [r.hash for r in recs] == GOLDEN_HASHES_U32


@pytest.mark.parametrize("mode", list(HashMode))
def test_jax_matches_oracle_all_modes(ecoli_seq, mode):
    """Full-record equality (hash, start, end, offset, rev) between the TPU
    pipeline and the numpy oracle on the golden fixture."""
    got = kminmers_list(ecoli_seq, 10, 5, 0.0005, mode)
    ref = oracle_kminmers(ecoli_seq, 10, 5, 0.0005, mode)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert (g.hash, g.start, g.end, g.offset, g.rev) == (
            r.hash,
            r.start,
            r.end,
            r.offset,
            r.rev,
        )


def test_iterator_facade(ecoli_seq):
    it = KminmersIterator(ecoli_seq, 10, 5, 0.0001, "regular")
    hashes = [km.get_hash() for km in it]
    assert hashes == GOLDEN_HASHES_U32
    offsets = [km.offset for km in it]
    assert offsets == list(range(len(GOLDEN_HASHES_U32)))
