"""Native host-runtime library (libquaffio.so) equivalence tests.

The C++ parser/tokeniser/envelope-seeder must agree exactly with the pure
Python implementations on the repository data.  Skipped when the library
has not been built (make -C native).
"""

import numpy as np
import pytest

from quaff_tpu import native


pytestmark = pytest.mark.skipif(
    not (native.available() or native.build_native()),
    reason="native library not built and no toolchain",
)


def test_native_parse_matches_python(data_dir, monkeypatch):
    from quaff_tpu.io import fastseq as fsmod

    for fname in [
        "c8f30.fastq.gz",
        "tiny.fasta",
        "tiny.fastq",
        "tiny.noqual.fastq",
        "tiny.truncated.fastq",
    ]:
        path = str(data_dir / fname)
        nat = native.read_fast_seqs_native(path)
        monkeypatch.setenv("QUAFF_TPU_NATIVE", "0")
        py = fsmod.read_fast_seqs(path)
        monkeypatch.setenv("QUAFF_TPU_NATIVE", "1")
        assert len(nat) == len(py)
        for a, b in zip(nat, py):
            assert a.name == b.name
            assert a.comment == b.comment
            assert a.seq == b.seq
            assert a.qual == b.qual
            assert a.filepos == b.filepos


def test_native_tokenize(data_dir):
    from quaff_tpu.io import read_fast_seqs

    seq = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))[0]
    np.testing.assert_array_equal(native.tokenize_native(seq.seq), seq.tokens())
    with pytest.raises(ValueError):
        native.tokenize_native("ACGN")


def test_native_diag_counts(data_dir):
    from quaff_tpu.envelope import diagonal_kmer_counts
    from quaff_tpu.io import KmerIndex, read_fast_seqs

    seq = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))[0]
    tok = seq.tokens()
    d, c = native.diag_kmer_counts_native(tok, tok, 6)
    d2, c2 = diagonal_kmer_counts(tok, KmerIndex(seq, 6), len(seq.seq), len(seq.seq))
    np.testing.assert_array_equal(d, d2)
    np.testing.assert_array_equal(c, c2)


def test_native_overlap_fill_matches_xla():
    """The C++ exact overlap fill (native/overlapdp.cpp) must agree with
    the XLA f64 engine cell-by-cell (sequential vs associative-scan
    rounding differs by ~1 ulp per lse, hence the tight tolerance rather
    than bitwise equality)."""
    from quaff_tpu.io.fastseq import FastSeq
    from quaff_tpu.alphabet import DNA_ALPHABET
    from quaff_tpu.envelope import sparse_envelope
    from quaff_tpu.io.fastseq import KmerIndex
    from quaff_tpu.model.params import default_params
    from quaff_tpu.dp.overlap import (
        OverlapScoreTables, overlap_device_tables, overlap_fill,
    )
    from quaff_tpu.overlap import OverlapBatch
    from quaff_tpu.native import overlap_fill_native
    from quaff_tpu.precision import x64_scope

    rng = np.random.default_rng(7)
    params = default_params()
    base = "".join("acgt"[t] for t in rng.integers(0, 4, 1200))
    cases = []
    for b in range(3):
        xl = int(rng.integers(400, 600))
        x0 = int(rng.integers(0, 150))
        yl = int(rng.integers(250, 350))
        y0 = int(rng.integers(400, 700))
        xs = base[x0 : x0 + xl]
        ys = list(base[y0 : y0 + yl])
        for i in range(len(ys)):
            if rng.random() < 0.1:
                ys[i] = DNA_ALPHABET[int(rng.integers(0, 4))]
        x = FastSeq(
            name=f"x{b}", seq=xs,
            qual="".join(chr(33 + int(q)) for q in rng.integers(3, 40, xl)),
        )
        # one no-qual case exercises the pair_yq emission table
        y = FastSeq(
            name=f"y{b}", seq="".join(ys),
            qual="" if b == 2 else
            "".join(chr(33 + int(q)) for q in rng.integers(3, 40, yl)),
        )
        env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=14)
        cases.append((x, y, env))

    for y_comp in (False, True):
        tables = OverlapScoreTables.from_params(params, y_comp)
        batch = OverlapBatch(cases, tables)
        nat = overlap_fill_native(batch, tables)
        assert nat is not None
        with x64_scope():
            tdev = overlap_device_tables(tables)
            ref = overlap_fill(
                tdev, batch.device(), return_matrices=True, dtype=np.float64
            )
        ref = {k: np.asarray(v) for k, v in ref.items()}
        np.testing.assert_allclose(nat["score"], ref["score"], rtol=1e-12)
        for k in ("mat", "ins", "del"):
            a, b2 = nat[k], ref[k]
            fin = np.isfinite(b2)
            assert (np.isfinite(a) == fin).all()
            np.testing.assert_allclose(
                a[fin], b2[fin], rtol=1e-11, atol=1e-11
            )


def test_native_overlap_fill_trimmed_rows():
    """Per-strip live-row trimming (row_off/n_rows), as used by the
    exact pass, must not change native strip scores."""
    from quaff_tpu.io.fastseq import FastSeq
    from quaff_tpu.envelope import sparse_envelope, pack_strips
    from quaff_tpu.io.fastseq import KmerIndex
    from quaff_tpu.model.params import default_params
    from quaff_tpu.dp.overlap import OverlapScoreTables
    from quaff_tpu.overlap import OverlapBatch
    from quaff_tpu.native import overlap_fill_native

    rng = np.random.default_rng(11)
    params = default_params()
    base = "".join("acgt"[t] for t in rng.integers(0, 4, 1600))
    # x matches deep inside y -> overlap strip on strongly negative
    # diagonals, whose live rows start far below y_len
    x = FastSeq(name="x", seq=base[600:900],
                qual="".join(chr(40) for _ in range(300)))
    y = FastSeq(name="y", seq=base[:1000],
                qual="".join(chr(40) for _ in range(1000)))
    env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=14)
    tables = OverlapScoreTables.from_params(params, False)

    entries, offs, rows = [], [], []
    for s in pack_strips(env, 4):
        d1, d2 = int(s.diagonals[0]), int(s.diagonals[-1])
        j0 = max(1, 1 - d2)
        entries.append((x, y, s))
        offs.append(j0 - 1)
        rows.append(max(min(len(y.seq), len(x.seq) - d1) - j0 + 1, 1))
    assert any(o > 0 for o in offs)
    full = overlap_fill_native(OverlapBatch(entries, tables), tables)
    trimmed = overlap_fill_native(
        OverlapBatch(entries, tables, row_off=offs, n_rows=max(rows)),
        tables,
    )
    np.testing.assert_allclose(trimmed["score"], full["score"], rtol=1e-12)


@pytest.mark.parametrize("mode,local", [("viterbi", True), ("viterbi", False),
                                        ("forward", True)])
def test_native_align_fill_matches_xla(mode, local):
    """The C++ read-vs-ref fill must agree with the XLA f64 engine."""
    from quaff_tpu.io.fastseq import FastSeq, KmerIndex
    from quaff_tpu.alphabet import DNA_ALPHABET
    from quaff_tpu.envelope import sparse_envelope
    from quaff_tpu.model.params import default_params
    from quaff_tpu.dp.scores import ScoreTables
    from quaff_tpu.dp.engine import (
        PairBatch, device_batch, device_tables, dp_fill,
    )
    from quaff_tpu.native import align_fill_native
    from quaff_tpu.precision import x64_scope

    rng = np.random.default_rng(5)
    params = default_params()
    tables = ScoreTables.from_params(params)
    base = "".join("acgt"[t] for t in rng.integers(0, 4, 1200))
    pairs = []
    for b in range(3):
        x = FastSeq(name=f"x{b}", seq=base)
        s0 = int(rng.integers(0, 500))
        ln = int(rng.integers(300, 500))
        ys = list(base[s0 : s0 + ln])
        for i in range(len(ys)):
            if rng.random() < 0.1:
                ys[i] = DNA_ALPHABET[int(rng.integers(0, 4))]
        y = FastSeq(
            name=f"y{b}", seq="".join(ys),
            qual="" if b == 2 else
            "".join(chr(33 + int(q)) for q in rng.integers(3, 40, ln)),
        )
        env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=20)
        pairs.append((x, y, env))

    batch = PairBatch.build(pairs, tables)
    nat = align_fill_native(batch, tables, mode=mode, local=local)
    assert nat is not None
    with x64_scope():
        ref = dp_fill(
            device_tables(tables), device_batch(batch), mode=mode,
            local=local, return_matrices=True, dtype=np.float64,
        )
    ref = {k: np.asarray(v) for k, v in ref.items()}
    np.testing.assert_allclose(nat["score"], ref["score"], rtol=1e-11)
    for k in ("mat", "ins", "del"):
        a, b2 = nat[k], ref[k]
        fin = np.isfinite(b2)
        assert (np.isfinite(a) == fin).all()
        np.testing.assert_allclose(a[fin], b2[fin], rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("qual", [True, False])
def test_native_viterbi_traceback_matches_python(qual, monkeypatch):
    """The C traceback walk must reproduce the Python walk's alignment
    byte-for-byte (same strict-greater candidate order and f64
    association), over quality and no-quality reads."""
    import io

    from quaff_tpu.dp import traceback as tbmod
    from quaff_tpu.dp.engine import PairBatch
    from quaff_tpu.dp.scores import ScoreTables
    from quaff_tpu.envelope import sparse_envelope
    from quaff_tpu.io.fastseq import FastSeq, KmerIndex
    from quaff_tpu.model.params import default_params
    from quaff_tpu.native import align_fill_native

    rng = np.random.default_rng(11)
    base = "".join("acgt"[t] for t in rng.integers(0, 4, 1500))
    tables = ScoreTables.from_params(default_params())
    x = FastSeq(name="ref", seq=base)
    ln = 900
    seq = list(base[200 : 200 + ln])
    for _ in range(int(ln * 0.07)):
        p = int(rng.integers(0, ln))
        seq[p] = "acgt"[int(rng.integers(0, 4))]
    y = FastSeq(
        name="read", seq="".join(seq),
        qual="".join(chr(33 + int(v)) for v in rng.integers(3, 40, ln))
        if qual else "",
    )
    env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=20)
    res = align_fill_native(
        PairBatch.build([(x, y, env)], tables), tables,
        mode="viterbi", local=True,
    )
    assert res is not None
    mat, ins, dele = res["mat"][0], res["ins"][0], res["del"][0]
    sc = float(res["score"][0])

    def fmt(a):
        s = io.StringIO()
        a.write_stockholm(s)
        return s.getvalue()

    got = fmt(tbmod.viterbi_traceback(x, y, env, tables, mat, ins, dele, sc))
    monkeypatch.setattr(
        native, "viterbi_traceback_cols", lambda *a, **k: None
    )
    want = fmt(tbmod.viterbi_traceback(x, y, env, tables, mat, ins, dele, sc))
    assert got == want
    assert "Ref" in got and "-" in got  # a real gapped alignment


@pytest.mark.parametrize("xq,yq", [(True, True), (True, False),
                                   (False, True), (False, False)])
def test_native_overlap_traceback_matches_python(xq, yq, monkeypatch):
    """Overlap traceback parity incl. the adjacent-ins/del squash and all
    four quality-presence combinations."""
    import io

    from quaff_tpu import overlap as ovmod
    from quaff_tpu.dp.overlap import OverlapScoreTables
    from quaff_tpu.envelope import sparse_envelope
    from quaff_tpu.io.fastseq import FastSeq, KmerIndex
    from quaff_tpu.model.params import default_params
    from quaff_tpu.native import overlap_fill_native
    from quaff_tpu.overlap import OverlapBatch

    rng = np.random.default_rng(17)
    base = "".join("acgt"[t] for t in rng.integers(0, 4, 1500))

    def mkread(s0, ln, q):
        seq = list(base[s0 : s0 + ln])
        for _ in range(int(ln * 0.07)):
            p = int(rng.integers(0, ln))
            seq[p] = "acgt"[int(rng.integers(0, 4))]
        return FastSeq(
            name=f"r{s0}", seq="".join(seq),
            qual="".join(
                chr(33 + int(v)) for v in rng.integers(3, 40, ln)
            ) if q else "",
        )

    tables = OverlapScoreTables.from_params(default_params(), False)
    x = mkread(100, 800, xq)
    y = mkread(400, 700, yq)
    env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=14)
    res = overlap_fill_native(OverlapBatch([(x, y, env)], tables), tables)
    assert res is not None
    mat, ins, dele = res["mat"][0], res["ins"][0], res["del"][0]
    sc = float(res["score"][0])

    def fmt(a):
        s = io.StringIO()
        a.write_stockholm(s)
        return s.getvalue()

    got = fmt(ovmod.overlap_traceback(x, y, env, tables, mat, ins, dele, sc))
    monkeypatch.setattr(
        native, "overlap_traceback_cols", lambda *a, **k: None
    )
    want = fmt(ovmod.overlap_traceback(x, y, env, tables, mat, ins, dele, sc))
    assert got == want


def test_align_score_native_matches_fill(data_dir):
    """Score-only native fills return bitwise-identical Viterbi scores to
    the stored-matrix fill (max is exactly associative) and matching
    Forward scores to f64 tolerance (same sequential op order, two-row
    buffers)."""
    import numpy as np
    import pytest

    from quaff_tpu import native
    from quaff_tpu.aligner import DPConfig, VITERBI_CELL_SIZE
    from quaff_tpu.dp.engine import PairBatch
    from quaff_tpu.dp.scores import ScoreTables
    from quaff_tpu.io.fastseq import KmerIndex, read_fast_seqs
    from quaff_tpu.model.params import default_params

    if not native.available() or not hasattr(
        native.get_lib(), "qdp_align_score"
    ):
        pytest.skip("native library not built")

    y = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))[0]
    x = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))[0]
    x.qual = ""
    tables = ScoreTables.from_params(default_params())
    config = DPConfig()
    env = config.make_envelope(x, KmerIndex(y, config.kmer_len),
                               VITERBI_CELL_SIZE)
    short = read_fast_seqs(str(data_dir / "tiny.fastq"))[0]
    env2 = config.make_envelope(x, KmerIndex(short, config.kmer_len),
                                VITERBI_CELL_SIZE)
    batch = PairBatch.build([(x, y, env), (x, short, env2)], tables)

    for mode in ("viterbi", "forward"):
        full = native.align_fill_native(batch, tables, mode=mode)
        sc = native.align_score_native(batch, tables, mode=mode)
        assert sc is not None
        if mode == "viterbi":
            assert np.array_equal(sc, full["score"])
        else:
            np.testing.assert_allclose(sc, full["score"], rtol=1e-12)


def test_native_lse2_softplus_table():
    """The fill's table-based log-sum-exp (native/overlapdp.cpp lse2 +
    SoftplusTable) must stay within a few ulp-scale of exact logaddexp
    across the table range, take the far-apart fast exit bitwise, and
    keep -inf transparency / NaN propagation."""
    import ctypes

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "qdp_lse2"):
        pytest.skip("native library predates qdp_lse2")
    lib.qdp_lse2.restype = ctypes.c_double
    lib.qdp_lse2.argtypes = [ctypes.c_double, ctypes.c_double]
    lse2 = lib.qdp_lse2

    # dense sweep over the table range at several magnitudes of m,
    # including d straddling every interval boundary
    d = np.linspace(0.0, 37.4999, 200_001)
    for m in (0.0, 1.0, -5.0, 123.456, -9876.5):
        got = np.array([lse2(m, m - x) for x in d[::97]])
        exact = np.logaddexp(0.0, -d[::97]) + m
        # atol covers the table error (~2e-14); rtol covers the 1-ulp
        # rounding of the final m + softplus addition at large |m|
        np.testing.assert_allclose(got, exact, rtol=3e-16, atol=1e-12)

    # fast exit: far apart with |m| >= 1 returns max bitwise
    assert lse2(100.0, 100.0 - 38.0) == 100.0
    assert lse2(-2.0, -50.0) == -2.0
    # tiny |m| far apart stays on the exact libm path
    x = lse2(0.5, 0.5 - 40.0)
    assert x == 0.5 + np.log1p(np.exp(-40.0))
    # -inf transparency and symmetry
    assert lse2(float("-inf"), -3.25) == -3.25
    assert lse2(-3.25, float("-inf")) == -3.25
    assert lse2(float("-inf"), float("-inf")) == float("-inf")
    assert lse2(1.25, 2.5) == lse2(2.5, 1.25)
    # NaN propagates (falls through to the exact path)
    assert np.isnan(lse2(float("nan"), 1.0))


def test_align_viterbi_path_matches_matrix_walk(data_dir):
    """The checkpointed fill+walk (qdp_align_viterbi_path) must return
    the SAME alignment rows, bounds and a bitwise-equal score as the
    stored-matrix fill + traceback, across quality/global/multi-strip
    variants (window refills recompute cells bitwise-identically)."""
    import numpy as np
    import pytest

    from quaff_tpu import native
    from quaff_tpu.aligner import DPConfig, VITERBI_CELL_SIZE
    from quaff_tpu.dp.engine import PairBatch
    from quaff_tpu.dp.scores import ScoreTables
    from quaff_tpu.dp.traceback import (
        viterbi_path_traceback,
        viterbi_traceback,
    )
    from quaff_tpu.envelope import pack_strips
    from quaff_tpu.io.fastseq import FastSeq, KmerIndex, read_fast_seqs
    from quaff_tpu.model.params import default_params

    if not native.align_path_available():
        pytest.skip("native library lacks qdp_align_viterbi_path")

    tables = ScoreTables.from_params(default_params())
    rng = np.random.default_rng(31)

    cases = []
    # c8f30 self-align strips (full-length, all three strips)
    x = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))[0]
    y = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))[0]
    x.qual = ""
    cfg = DPConfig(kmer_threshold=14)
    env = cfg.make_envelope(x, KmerIndex(y, 6), VITERBI_CELL_SIZE)
    for s in pack_strips(env, 3):
        cases.append((x, y, s, True))
    # random short pairs: qual/noqual, local/global, window edge rows
    for ln in (37, 63, 64, 65, 129, 200):
        base = "".join("acgt"[t] for t in rng.integers(0, 4, ln + 40))
        seq = list(base[20 : 20 + ln])
        for _ in range(max(1, ln // 15)):
            p = int(rng.integers(0, ln))
            seq[p] = "acgt"[int(rng.integers(0, 4))]
        for qual in (True, False):
            yy = FastSeq(
                name=f"y{ln}", seq="".join(seq),
                qual="".join(
                    chr(33 + int(q)) for q in rng.integers(3, 40, ln)
                ) if qual else "",
            )
            xx = FastSeq(name=f"x{ln}", seq=base)
            e = cfg.make_envelope(xx, KmerIndex(yy, 6), VITERBI_CELL_SIZE)
            for s in pack_strips(e, 3):
                cases.append((xx, yy, s, True))
                cases.append((xx, yy, s, False))

    n_finite = 0
    for xx, yy, s, local in cases:
        full = native.align_fill_native(
            PairBatch.build([(xx, yy, s)], tables), tables,
            mode="viterbi", local=local,
        )
        sc = float(full["score"][0])
        if not np.isfinite(sc):
            continue
        got = viterbi_path_traceback(xx, yy, s, tables, local=local)
        n_finite += 1
        want = viterbi_traceback(
            xx, yy, s, tables, full["mat"][0], full["ins"][0],
            full["del"][0], sc, local=local,
        )
        assert got.score == want.score  # bitwise
        for g, w in zip(got.gapped_seq, want.gapped_seq):
            assert g.seq == w.seq
            assert g.qual == w.qual
            assert g.comment == w.comment
    assert n_finite >= 8


def test_overlap_viterbi_path_batch_matches_per_call():
    """The batched exact-pass FFI driver (qdp_overlap_viterbi_path_batch:
    one native call per task slice, round 5) must return exactly the
    per-call wrapper's results — cols, bounds, end score — for every
    task, across qual modes and strand tables, including no-alignment
    (-2) tasks."""
    from quaff_tpu.dp.overlap import OverlapScoreTables
    from quaff_tpu.envelope import pack_strips, sparse_envelope
    from quaff_tpu.io.fastseq import FastSeq, KmerIndex
    from quaff_tpu.model.params import default_params
    from quaff_tpu.native import (
        overlap_viterbi_path_cols,
        overlap_viterbi_path_cols_batch,
    )
    from quaff_tpu.overlap import _y_strand_arrays

    if not native.overlap_path_available():
        pytest.skip("native library not built")

    rng = np.random.default_rng(23)
    base = "".join("acgt"[t] for t in rng.integers(0, 4, 1200))

    def mkread(s0, ln, q):
        seq = list(base[s0 : s0 + ln])
        for _ in range(int(ln * 0.08)):
            p = int(rng.integers(0, ln))
            seq[p] = "acgt"[int(rng.integers(0, 4))]
        return FastSeq(
            name=f"r{s0}_{ln}", seq="".join(seq),
            qual="".join(
                chr(33 + int(v)) for v in rng.integers(3, 40, ln)
            ) if q else "",
        )

    params = default_params()
    tabs = {
        False: OverlapScoreTables.from_params(params, False),
        True: OverlapScoreTables.from_params(params, True),
    }
    tasks = []
    for i in range(10):
        xq, yq = bool(i % 2), bool((i // 2) % 2)
        strand = bool(i % 3 == 0)
        x = mkread(int(rng.integers(0, 400)), int(rng.integers(200, 600)), xq)
        y = mkread(int(rng.integers(0, 400)), int(rng.integers(200, 600)), yq)
        tables = tabs[strand]
        env = sparse_envelope(
            x, KmerIndex(y, 6), band_size=64, kmer_threshold=14
        )
        segs = pack_strips(env, 3)
        s = segs[int(rng.integers(0, len(segs)))]
        d1, d2 = int(s.diagonals[0]), int(s.diagonals[-1])
        j0 = max(1, 1 - d2)
        rows = max(min(len(y.seq), len(x.seq) - d1) - j0 + 1, 1)
        x_tok = x.tokens()
        x_q = x.qual_scores() if x.has_qual() else None
        x_mk = x.kmers(tables.match_kmer_len)
        x_ik_pad = np.concatenate([[0], x.kmers(tables.indel_kmer_len)])
        y_tok, y_mk, y_ik_raw, y_q = _y_strand_arrays(y, tables)
        y_ik_pad = np.concatenate([[0], y_ik_raw])
        tasks.append((
            x_mk, x_ik_pad, x_q, len(x.seq), x_q is not None,
            y_mk, y_ik_pad, y_q, len(y.seq), y_q is not None,
            j0 - 1, rows, s.band_lo, s.band_width, s.member_mask(),
            tables,
        ))

    got = overlap_viterbi_path_cols_batch(tasks)
    want = [overlap_viterbi_path_cols(*t) for t in tasks]
    assert len(got) == len(want) == len(tasks)
    for (gc, ge), (wc, we) in zip(got, want):
        assert ge == we  # end scores bitwise equal
        if wc is None:
            assert gc is None
            continue
        for a, b in zip(gc[:2], wc[:2]):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        assert gc[2:] == wc[2:]  # bounds


def test_diag_kmer_index_matches_per_pair_join():
    """The prebuilt counting-bucket index join (round 5) returns the
    same (diags, counts) as the per-pair join for random token pairs
    across k values."""
    from quaff_tpu.native import (
        diag_kmer_counts_native,
        diag_kmer_index_native,
        diag_kmer_counts_indexed_native,
    )

    if native.get_lib() is None or not hasattr(
        native.get_lib(), "qio_diag_kmer_index"
    ):
        pytest.skip("native library not built")

    rng = np.random.default_rng(5)
    for trial in range(25):
        xl = int(rng.integers(5, 700))
        yl = int(rng.integers(5, 700))
        k = int(rng.integers(3, 11))
        x = rng.integers(0, 4, xl).astype(np.int32)
        y = rng.integers(0, 4, yl).astype(np.int32)
        idx = diag_kmer_index_native(y, k)
        assert idx is not None
        d1, c1 = diag_kmer_counts_indexed_native(x, yl, k, idx)
        d2, c2 = diag_kmer_counts_native(x, y, k)
        assert np.array_equal(d1, d2), trial
        assert np.array_equal(c1, c2), trial
