"""Coefficient-level property tests for the progressive JPEG scan
machinery (llm/jpeg.py Annex G paths): random quantized-coefficient
grids round-trip through the scan EMITTERS and DECODERS directly —
sharper than the pixel differentials because every value survives or
fails exactly, with no DCT/quantization in the way, and hypothesis
drives the EOBn / ZRL / refinement-correction edge cases (sparse
blocks, long zero-history runs, sign mixes, band boundaries)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

import turbine_maintenance_etl_spark.llm.jpeg as J

_AC_CODES = J._canonical_codes(J._PROG_AC_BITS, J._PROG_AC_VALS)
_AC_MAP = J._decode_map(J._PROG_AC_BITS, J._PROG_AC_VALS)
_DC_CODES = J._canonical_codes(J._DC_LUMA_BITS, J._DC_LUMA_VALS)
_DC_MAP = J._decode_map(J._DC_LUMA_BITS, J._DC_LUMA_VALS)


def _grids(max_blocks=6, max_mag=300):
    """(bh, bw, 64) int64 coefficient grids, biased sparse (zipf-ish
    corpora of AC values: most zero, some small, a few large)."""
    return st.integers(1, max_blocks).flatmap(
        lambda nb: st.lists(
            st.lists(
                st.one_of(
                    st.just(0),
                    st.integers(-3, 3),
                    st.integers(-max_mag, max_mag),
                ),
                min_size=64,
                max_size=64,
            ),
            min_size=nb,
            max_size=nb,
        ).map(lambda rows: np.array(rows, dtype=np.int64).reshape(1, nb, 64))
    )


def _roundtrip_ac(grid, ss, se, al_first):
    """Emit AC first pass at al_first then refinements down to 0;
    decode each scan in sequence; return the reconstructed grid."""
    bh, bw, _ = grid.shape
    dec = np.zeros_like(grid)
    for al in range(al_first, -1, -1):
        wr = J._BitWriter()
        if al == al_first:
            J._emit_ac_first_scan(wr, grid, bh, bw, ss, se, al, _AC_CODES)
        else:
            J._emit_ac_refine_scan(wr, grid, bh, bw, ss, se, al, _AC_CODES)
        wr.flush()
        data = bytes(wr.out) + b"\xff\xd9"
        reader = J._BitReader(data, 0)
        state = {"eobrun": 0}
        for by in range(bh):
            for bx in range(bw):
                if al == al_first:
                    J._ac_first_prog(reader, _AC_MAP, dec[by, bx], ss, se, al, state)
                else:
                    J._ac_refine_prog(reader, _AC_MAP, dec[by, bx], ss, se, al, state)
    return dec


@settings(max_examples=60, deadline=None)
@given(grid=_grids(), al_first=st.integers(0, 3), band=st.sampled_from(
    [(1, 63), (1, 5), (6, 63), (10, 20), (63, 63)]
))
def test_ac_scan_roundtrip_reconstructs_exactly(grid, al_first, band):
    ss, se = band
    dec = _roundtrip_ac(grid, ss, se, al_first)
    # only the band is transmitted; everything else must remain zero
    want = np.zeros_like(grid)
    want[:, :, ss : se + 1] = grid[:, :, ss : se + 1]
    assert np.array_equal(dec, want)


@settings(max_examples=60, deadline=None)
@given(
    dcs=st.lists(st.integers(-1024, 1023), min_size=1, max_size=12),
    al_first=st.integers(0, 2),
)
def test_dc_scan_roundtrip_reconstructs_exactly(dcs, al_first):
    nb = len(dcs)
    grid = np.zeros((1, nb, 64), dtype=np.int64)
    grid[0, :, 0] = dcs
    grids = {1: grid}
    comps = [(1, 1, 1)]
    dec = np.zeros_like(grid)
    for al in range(al_first, -1, -1):
        wr = J._BitWriter()
        if al == al_first:
            J._emit_dc_first_scan(wr, grids, comps, {1: _DC_CODES}, al)
        else:
            J._emit_dc_refine_scan(wr, grids, comps, al)
        wr.flush()
        data = bytes(wr.out) + b"\xff\xd9"
        reader = J._BitReader(data, 0)
        pred = {1: 0}
        for bx in range(nb):
            if al == al_first:
                J._dc_first_prog(reader, _DC_MAP, dec[0, bx], pred, 1, al)
            else:
                J._dc_refine_prog(reader, dec[0, bx], al)
    assert np.array_equal(dec[0, :, 0], grid[0, :, 0])


def test_eobn_run_lengths_roundtrip():
    """A grid engineered to produce every EOBn size class: one nonzero
    block followed by runs of 1, 2, 15, 16, 255 empty blocks."""
    runs = [1, 2, 15, 16, 255]
    blocks = []
    for r in runs:
        b = np.zeros(64, dtype=np.int64)
        b[5] = 7
        blocks.append(b)
        blocks.extend(np.zeros(64, dtype=np.int64) for _ in range(r))
    grid = np.stack(blocks)[None, :, :]
    dec = _roundtrip_ac(grid, 1, 63, 0)
    assert np.array_equal(dec, grid)
