"""Serialization + PLINK .bed ingest (hand-built binary fixtures; the
decode is validated against an independent per-bit Python loop)."""

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu.io import load_bitmatrix, load_plink_bed, save_bitmatrix


def _write_bed(path, codes):
    """Independent scalar PLINK1 encoder: codes uint8 [V, N] in {0,1,2,3}
    (00 hom-A1, 01 missing, 10 het, 11 hom-A2), SNP-major, LSB-first."""
    v, n = codes.shape
    bpv = (n + 3) // 4
    out = bytearray(b"\x6c\x1b\x01")
    for vi in range(v):
        row = bytearray(bpv)
        for si in range(n):
            row[si // 4] |= int(codes[vi, si]) << (2 * (si % 4))
        out += row
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_bitmatrix_roundtrip(tmp_path):
    bm = random_bitmatrix(20, 300, 0.3, seed=81)
    p = str(tmp_path / "bm.npz")
    save_bitmatrix(bm, p)
    got = load_bitmatrix(p)
    np.testing.assert_array_equal(got.packed, bm.packed)
    assert got.m_bits == bm.m_bits


def test_bitmatrix_mmap_roundtrip_drives_streaming(tmp_path):
    """Out-of-core pair: the loaded matrix stays a read-only memmap (no
    full-panel RAM copy) and drives the streaming walk + queries
    exactly — C11's driver with a DISK-bounded operand."""
    from stormtpu.config import EngineConfig
    from stormtpu.io import load_bitmatrix_mmap, save_bitmatrix_mmap
    from stormtpu.oracle import oracle_count_matrix
    from stormtpu.stream import load_streamed_matrix, stream_count_matrix
    from stormtpu.stream_query import stream_topk_neighbors

    bm = random_bitmatrix(52, 700, 0.25, seed=82)
    p = str(tmp_path / "panel.npy")
    save_bitmatrix_mmap(bm, p)
    got = load_bitmatrix_mmap(p)
    # np.asarray in from_packed strips the memmap SUBCLASS but must stay
    # a zero-copy view of the file mapping
    assert not got.packed.flags.owndata
    assert not got.packed.flags.writeable
    base = got.packed
    while getattr(base, "base", None) is not None:
        base = base.base
    import mmap as _mmap

    assert isinstance(base, (np.memmap, _mmap.mmap)), type(base)
    np.testing.assert_array_equal(np.asarray(got.packed), bm.packed)
    np.testing.assert_array_equal(got.row_nnz, bm.row_nnz)

    cfg = EngineConfig(k1_tile_rows=8, k1_tile_words=128,
                       k2_tile_rows=8, k2_tile_words=8)
    out = str(tmp_path / "stripes")
    stream_count_matrix(got, out, superblock_rows=16, kernel="xla_int8",
                        config=cfg, interpret=True)
    want = oracle_count_matrix(bm.packed)
    np.testing.assert_array_equal(load_streamed_matrix(out), want)

    vals, _ = stream_topk_neighbors(got, 3, superblock_rows=16,
                                    config=cfg, interpret=True)
    cm = want.astype(np.int64).copy()
    np.fill_diagonal(cm, -1)
    np.testing.assert_array_equal(
        vals, np.maximum(-np.sort(-cm, axis=1)[:, :3], 0))

    # mmap=False materializes; sidecar mismatch raises
    full = load_bitmatrix_mmap(p, mmap=False)
    assert not isinstance(full.packed, np.memmap)
    import json

    meta = json.loads(open(p + ".json").read())
    meta["n"] = 9
    open(p + ".json", "w").write(json.dumps(meta))
    with pytest.raises(ValueError):
        load_bitmatrix_mmap(p)


def test_plink_bed_decode_all_encodings(tmp_path):
    rng = np.random.default_rng(82)
    v, n = 9, 13  # n % 4 != 0: pad bits in the last byte must be ignored
    codes = rng.integers(0, 4, size=(v, n)).astype(np.uint8)
    p = str(tmp_path / "g.bed")
    _write_bed(p, codes)
    for encode, pred in (
        ("carrier", lambda c: c >= 2),
        ("hom_a2", lambda c: c == 3),
        ("het", lambda c: c == 2),
        ("hom_a1", lambda c: c == 0),
        ("missing", lambda c: c == 1),
    ):
        bm = load_plink_bed(p, n, encode=encode)
        assert (bm.n, bm.m_bits) == (v, n)
        from stormtpu.layout import unpack_bits

        np.testing.assert_array_equal(
            unpack_bits(bm.packed, n), pred(codes).astype(np.uint8),
            err_msg=encode,
        )


def test_plink_bed_infers_variants_and_transposes(tmp_path):
    rng = np.random.default_rng(83)
    v, n = 6, 8
    codes = rng.integers(0, 4, size=(v, n)).astype(np.uint8)
    p = str(tmp_path / "g.bed")
    _write_bed(p, codes)
    bm = load_plink_bed(p, n)  # n_variants inferred
    assert bm.n == v
    bs = load_plink_bed(p, n, n_variants=v, rows="samples")
    assert (bs.n, bs.m_bits) == (n, v)
    from stormtpu.layout import unpack_bits

    np.testing.assert_array_equal(
        unpack_bits(bs.packed, v), (codes >= 2).astype(np.uint8).T
    )


def test_plink_bed_drives_the_engine(tmp_path):
    """End-to-end domain flow: .bed → carrier bitmaps → exact LD-style
    counts and an r² screen."""
    from stormtpu import intersect_count_matrix, pairs_above
    from stormtpu.oracle import oracle_count_matrix

    rng = np.random.default_rng(84)
    v, n = 40, 200
    codes = (rng.random((v, n)) < 0.3).astype(np.uint8) * 2  # het carriers
    codes += ((rng.random((v, n)) < 0.3) & (codes == 2)).astype(np.uint8)
    p = str(tmp_path / "g.bed")
    _write_bed(p, codes)
    bm = load_plink_bed(p, n)
    want = oracle_count_matrix(bm.packed)
    np.testing.assert_array_equal(intersect_count_matrix(bm), want)
    ii, jj, r2 = pairs_above(bm, 0.5, measure="r2")
    assert np.all(ii < jj)


def test_plink_bed_errors(tmp_path):
    p = str(tmp_path / "bad.bed")
    with open(p, "wb") as f:
        f.write(b"\x00\x01\x02")
    with pytest.raises(ValueError, match="magic"):
        load_plink_bed(p, 4)
    with open(p, "wb") as f:
        f.write(b"\x6c\x1b\x00" + b"\x00")  # individual-major mode byte
    with pytest.raises(ValueError, match="individual-major"):
        load_plink_bed(p, 4)
    codes = np.zeros((3, 5), dtype=np.uint8)
    _write_bed(p, codes)
    with pytest.raises(ValueError, match="not a multiple"):
        load_plink_bed(p, 13)  # 6 genotype bytes, 4 bytes/variant
    with pytest.raises(ValueError, match="expected"):
        load_plink_bed(p, 5, n_variants=4)
    with pytest.raises(ValueError, match="encode"):
        load_plink_bed(p, 5, encode="bogus")
    with pytest.raises(ValueError, match="rows"):
        load_plink_bed(p, 5, rows="bogus")


def test_plink_trio_sidecars_and_cli(tmp_path):
    """Dims come from the .fam/.bim sidecars; the CLI loads a .bed
    directly (the PLINK trio convention)."""
    from stormtpu.cli import main
    from stormtpu.oracle import oracle_count_matrix

    rng = np.random.default_rng(85)
    v, n = 7, 11
    codes = rng.integers(0, 4, size=(v, n)).astype(np.uint8)
    p = tmp_path / "panel.bed"
    _write_bed(str(p), codes)
    (tmp_path / "panel.fam").write_text(
        "\n".join(f"F{i} I{i} 0 0 0 -9" for i in range(n)) + "\n"
    )
    (tmp_path / "panel.bim").write_text(
        "\n".join(f"1 rs{i} 0 {i} A C" for i in range(v)) + "\n"
    )
    bm = load_plink_bed(str(p))
    assert (bm.n, bm.m_bits) == (v, n)

    out = tmp_path / "c.npy"
    assert main(["count", "--in", str(p), "--out", str(out)]) == 0
    np.testing.assert_array_equal(np.load(out), oracle_count_matrix(bm.packed))

    with pytest.raises(ValueError, match="sidecar"):
        load_plink_bed(str(tmp_path / "panel2.bed").replace("panel2", "panel3"))


def test_plink_bed_chunked_decode_matches_single_shot(tmp_path):
    """The chunked decode (transients bounded at ~2·chunk·N, not
    ~2.25× the whole .bed body) is exact across chunk boundaries in
    both orientations, including a partial tail chunk."""
    rng = np.random.default_rng(17)
    codes = rng.integers(0, 4, size=(100, 13), dtype=np.uint8)
    p = str(tmp_path / "chunky.bed")
    _write_bed(p, codes)
    for rows in ("variants", "samples"):
        whole = load_plink_bed(p, 13, 100, rows=rows)
        chunked = load_plink_bed(p, 13, 100, rows=rows, chunk_variants=32)
        np.testing.assert_array_equal(chunked.packed, whole.packed)
        assert chunked.m_bits == whole.m_bits
    with pytest.raises(ValueError, match="multiple of 32"):
        load_plink_bed(p, 13, 100, chunk_variants=17)
