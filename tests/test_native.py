"""Native C++ data-layer tests (ctypes module, Python-fallback parity)."""

import numpy as np
import pytest

from topicmodelsvb_jl_tpu.native import fill_dense, get_lib, parse_delimited_ints

needs_native = pytest.mark.skipif(get_lib() is None,
                                  reason="native toolchain unavailable")


@needs_native
def test_parse_matches_python():
    rng = np.random.default_rng(3)
    lines = []
    for _ in range(500):
        n = int(rng.integers(0, 30))
        lines.append(",".join(str(int(x)) for x in rng.integers(-5, 9999, n)))
    buf = ("\n".join(lines) + "\n").encode()
    vals, offs = parse_delimited_ints(buf)
    py = [[int(p) for p in ln.split(",")] if ln else [] for ln in lines]
    assert len(offs) - 1 == len(lines)
    for i, pl in enumerate(py):
        assert vals[offs[i]:offs[i + 1]].tolist() == pl


@needs_native
def test_parse_no_trailing_newline_and_crlf():
    vals, offs = parse_delimited_ints(b"1,2\r\n3")
    assert offs.tolist() == [0, 2, 3]
    assert vals.tolist() == [1, 2, 3]


@needs_native
def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_delimited_ints(b"1,2\n3,x,4\n")


@needs_native
def test_fill_dense():
    t, c = fill_dense(np.array([5, 6, 7]), np.array([2.0, 1.0, 3.0]),
                      np.array([0, 1, 3]), rows=2, L=4)
    assert t.tolist() == [[4, 0, 0, 0], [5, 6, 0, 0]]
    assert c.tolist() == [[2.0, 0, 0, 0], [1.0, 3.0, 0, 0]]


def test_readcorp_native_matches_python(tmp_path):
    """readcorp through the native parser equals the pure-Python path."""
    import topicmodelsvb_jl_tpu.corpus as corpuslib

    rng = np.random.default_rng(1)
    lines = []
    M = 40
    for _ in range(M):
        n = int(rng.integers(1, 12))
        ts = rng.integers(1, 50, n)
        cs = rng.integers(1, 4, n)
        lines.append(",".join(map(str, ts)))
        lines.append(",".join(map(str, cs)))
    f = tmp_path / "docs.txt"
    f.write_text("\n".join(lines) + "\n")

    corp_n = corpuslib.readcorp(docfile=str(f), counts=True)
    # force the python path by temporarily hiding the native module
    import topicmodelsvb_jl_tpu.native as native
    lib, native._lib, native._tried = native._lib, None, True
    try:
        corp_p = corpuslib.readcorp(docfile=str(f), counts=True)
    finally:
        native._lib, native._tried = lib, True
    assert len(corp_n) == len(corp_p) == M
    for a, b in zip(corp_n.docs, corp_p.docs):
        assert a.terms == b.terms and a.counts == b.counts


@needs_native
def test_parse_strict_matches_python_rejections():
    """Inputs Python's int() rejects must also fail natively, so corpus
    loading is toolchain-independent."""
    for bad in (b"1,,2\n", b"1,\n", b"3 4\n", b"-\n", b"1,-,2\n"):
        with pytest.raises(ValueError):
            parse_delimited_ints(bad)
    # lone \r is a line break (splitlines semantics)
    vals, offs = parse_delimited_ints(b"1\r2\n")
    assert offs.tolist() == [0, 1, 2]
    assert vals.tolist() == [1, 2]


@needs_native
def test_parse_stricter_grammar_falls_back(tmp_path):
    """The native grammar is a documented strict *subset* of Python's
    int(): '+'-prefixed integers and >19-digit values fail natively, but
    readcorp falls back to the pure-Python parser on any native error, so
    corpus loading behaves identically with or without the library."""
    from topicmodelsvb_jl_tpu.corpus import readcorp

    with pytest.raises(ValueError):
        parse_delimited_ints(b"+5\n")
    # int64 overflow must be detected, not silently wrapped
    with pytest.raises(ValueError):
        parse_delimited_ints(b"99999999999999999999\n")  # 20 digits
    # INT64_MAX itself still parses exactly
    vals, _ = parse_delimited_ints(b"9223372036854775807\n")
    assert vals.tolist() == [9223372036854775807]
    # end-to-end: readcorp parses '+'-prefixed input via the fallback
    f = tmp_path / "docs.txt"
    f.write_text("+5,2\n")
    corp = readcorp(docfile=str(f))
    assert corp.docs[0].terms == [5, 2]
