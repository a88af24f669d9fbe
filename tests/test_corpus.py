"""Data-layer tests (Document/Corpus, I/O, mutators, fixcorp pipeline)."""

import os

import pytest

from topicmodelsvb_jl_tpu.corpus import (
    Corpus, CorpusError, Document, DocumentError,
    abridge_corp, alphabetize_corp, check_corp, compact_corp, condense_corp,
    fixcorp, pad_corp, readcorp, remove_empty_docs, remove_redundant,
    remove_terms, stop_corp, trim_corp, trim_docs, writecorp,
)


def test_document_invariants():
    d = Document(terms=[1, 2, 3])
    assert d.counts == [1, 1, 1]
    assert len(d) == 3 and d.size == 3
    with pytest.raises(DocumentError):
        Document(terms=[0, 1])
    with pytest.raises(DocumentError):
        Document(terms=[1], counts=[1, 2])
    with pytest.raises(DocumentError):
        Document(terms=[1], counts=[0])
    with pytest.raises(DocumentError):
        Document(readers=[1], ratings=[])


def test_corpus_invariants():
    doc = Document(terms=[1, 2], counts=[2, 1], readers=[1], ratings=[1])
    corp = Corpus(docs=[doc], vocab={1: "a", 2: "b"}, users={1: "u"})
    check_corp(corp)
    assert corp.shape == (1, 2, 1)

    bad = Corpus(docs=[doc], vocab={1: "a", 2: "b", 5: "c"}, users={1: "u"})
    with pytest.raises(CorpusError):
        check_corp(bad)  # vocab keys not a unit range

    bad2 = Corpus(docs=[Document(terms=[9])], vocab={1: "a"})
    with pytest.raises(CorpusError):
        check_corp(bad2)  # term key outside vocab


def test_readcorp_writecorp_roundtrip(tmp_path):
    corp = Corpus(
        docs=[
            Document(terms=[1, 2, 3], counts=[2, 1, 1], readers=[1, 2], ratings=[1, 1]),
            Document(terms=[2, 4], counts=[5, 1], readers=[2], ratings=[3]),
        ],
        vocab={1: "alpha", 2: "beta", 3: "gamma", 4: "delta"},
        users={1: "ann", 2: "bob"},
    )
    corp.docs[0].title = "first"
    corp.docs[1].title = "second"
    paths = {k: str(tmp_path / f"{k}.txt") for k in ("doc", "vocab", "user", "title")}
    writecorp(
        corp, docfile=paths["doc"], vocabfile=paths["vocab"], userfile=paths["user"],
        titlefile=paths["title"], counts=True, readers=True, ratings=True,
    )
    corp2 = readcorp(
        docfile=paths["doc"], vocabfile=paths["vocab"], userfile=paths["user"],
        titlefile=paths["title"], counts=True, readers=True, ratings=True,
    )
    assert corp2.docs[0] == corp.docs[0]
    assert corp2.docs[1] == corp.docs[1]
    assert corp2.vocab == corp.vocab
    assert corp2.users == corp.users


def test_condense_and_abridge():
    doc = Document(terms=[1, 1, 2], counts=[1, 2, 1])
    corp = Corpus(docs=[doc], vocab={1: "a", 2: "b"})
    condense_corp(corp)
    assert sorted(zip(doc.terms, doc.counts)) == [(1, 3), (2, 1)]
    abridge_corp(corp, n=2)
    assert doc.terms == [1]


def test_compact_and_trim():
    doc = Document(terms=[3, 7], counts=[1, 1])
    corp = Corpus(docs=[doc], vocab={3: "c", 7: "g", 9: "z"})
    trim_corp(corp)
    assert set(corp.vocab) == {3, 7}
    compact_corp(corp)
    assert set(corp.vocab) == {1, 2}
    assert doc.terms == [1, 2]
    check_corp(corp)


def test_pad_and_trim_docs():
    doc = Document(terms=[1, 5], counts=[1, 1], readers=[4], ratings=[2])
    corp = Corpus(docs=[doc], vocab={1: "a"}, users={})
    pad_corp(corp)
    assert corp.vocab[5] == "#term5"
    assert corp.users[4] == "#user4"

    doc2 = Document(terms=[1, 5], counts=[1, 1], readers=[4], ratings=[2])
    corp2 = Corpus(docs=[doc2], vocab={1: "a"}, users={})
    trim_docs(corp2)
    assert doc2.terms == [1] and doc2.readers == []


def test_remove_redundant_and_terms():
    docs = [Document(terms=[1, 2, 3], counts=[1, 1, 1])]
    corp = Corpus(docs=docs, vocab={1: "cat", 2: "cat", 3: "dog"})
    remove_redundant(corp)
    assert docs[0].terms == [1, 1, 3]
    remove_terms(corp, ["dog"])
    assert docs[0].terms == [1, 1]


def test_stopwords_and_empty_docs():
    docs = [Document(terms=[1, 2], counts=[1, 1]), Document(terms=[1], counts=[1])]
    corp = Corpus(docs=docs, vocab={1: "the", 2: "science"})
    stop_corp(corp)
    assert docs[0].terms == [2] and docs[1].terms == []
    remove_empty_docs(corp)
    assert len(corp) == 1


def test_alphabetize():
    docs = [Document(terms=[1, 2], counts=[1, 1])]
    corp = Corpus(docs=docs, vocab={1: "zebra", 2: "apple"})
    alphabetize_corp(corp)
    assert corp.vocab == {1: "apple", 2: "zebra"}
    assert docs[0].terms == [2, 1]


def test_fixcorp_pipeline():
    docs = [
        Document(terms=[4, 4, 9], counts=[1, 2, 1]),
        Document(terms=[9, 12], counts=[1, 1]),
    ]
    corp = Corpus(docs=docs, vocab={4: "b", 9: "a", 12: "rare"})
    fixcorp(corp, condense=True, abridge=2, trim=True, alphabetize=True,
            remove_empty_docs=True)
    check_corp(corp)
    assert set(corp.vocab.values()) == {"a", "b"}
    # alphabetized: a < b
    assert corp.vocab[1] == "a" and corp.vocab[2] == "b"


def test_shared_doc_rewritten_once():
    doc = Document(terms=[1, 1], counts=[1, 1])
    corp = Corpus(docs=[doc, doc], vocab={1: "a"})
    condense_corp(corp)
    assert doc.counts == [2]  # not doubled


def test_stopword_list_is_reference_exact():
    """The bundled stop list must be byte-identical to the reference's
    datasets/stopwords.txt — 546 lines of which line 438 is blank, so
    545 words (SURVEY §7.3: preprocessing differences silently change
    every downstream number)."""
    import os

    from topicmodelsvb_jl_tpu.datasets import _DATA_DIR, load_stopwords

    ref = "/root/reference/datasets/stopwords.txt"
    if os.path.exists(ref):
        ours = open(os.path.join(_DATA_DIR, "stopwords.txt"), "rb").read()
        assert ours == open(ref, "rb").read()
    words = load_stopwords()
    assert len(words) == 545
    # spot-check entries characteristic of the reference list
    for w in ("a's", "ain't", "the", "zero", "allows"):
        assert w in words, w
    assert "science" not in words


def test_stop_fixcorp_matches_reference_pipeline():
    """stop_corp + fixcorp on a small corpus reproduces a hand-computed
    run of the reference pipeline (stop_corp!, Corpus.jl:622-634; fixcorp!
    order, Corpus.jl:711-730)."""
    # vocab: 1="the" (stop), 2="quantum" , 3="with" (stop), 4="physics"
    docs = [
        Document(terms=[1, 2, 3, 4], counts=[3, 2, 1, 1]),
        Document(terms=[1, 3], counts=[1, 1]),     # all stop words
        Document(terms=[2, 4], counts=[1, 2]),
    ]
    corp = Corpus(docs=docs, vocab={1: "the", 2: "quantum", 3: "with", 4: "physics"})
    fixcorp(corp, stop=True, trim=True, alphabetize=True, remove_empty_docs=True)
    check_corp(corp)
    # reference-order result: stop removes keys {1,3}; trim drops them
    # from vocab; alphabetize maps physics<quantum; doc 2 emptied and
    # removed; compact relabels to 1..2
    assert corp.vocab == {1: "physics", 2: "quantum"}
    assert len(corp) == 2
    assert corp.docs[0].terms == [2, 1] and corp.docs[0].counts == [2, 1]
    assert corp.docs[1].terms == [2, 1] and corp.docs[1].counts == [1, 2]


def test_readcorp_stamps_roundtrip(tmp_path):
    """stamps doc-block line (v0.6 Corpus.jl:47-62) round-trips."""
    corp = Corpus(
        docs=[
            Document(terms=[1, 2], counts=[2, 1], stamp=1984.25),
            Document(terms=[2], counts=[3], stamp=1985.0),
        ],
        vocab={1: "mac", 2: "apple"},
    )
    doc = str(tmp_path / "docs.txt")
    writecorp(corp, docfile=doc, counts=True, stamps=True)
    corp2 = readcorp(docfile=doc, counts=True, stamps=True)
    assert [d.stamp for d in corp2.docs] == [1984.25, 1985.0]
    assert corp2.docs[0].terms == [1, 2] and corp2.docs[0].counts == [2, 1]


def test_dataset_loaders_mac_and_englishwords():
    from topicmodelsvb_jl_tpu.datasets import load_englishwords, load_mac

    words = load_englishwords()
    assert len(words) == 58_110
    assert "aardvark" in words

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        corp = load_mac(subset=50)
    check_corp(corp)
    assert len(corp) == 50
    # the mac corpus is the DTM dataset: every doc carries a timestamp
    assert all(d.stamp is not None for d in corp.docs)
    # real lexicon file present in this environment → real vocab names
    assert len(corp.vocab) >= 50


def test_corpus_container_surface():
    """push!/pop!/pushfirst!/popfirst!/insert!/deleteat!/setindex!/
    findfirst/findall overloads (Corpus.jl:131-149)."""
    a = Document(terms=[1]); b = Document(terms=[2]); c = Document(terms=[3])
    corp = Corpus(docs=[a], vocab={1: "x", 2: "y", 3: "z"})
    corp.push(b)
    assert corp.docs == [a, b]
    corp.pushfirst(c)
    assert corp.docs == [c, a, b]
    assert corp.popfirst() is c
    assert corp.pop() is b
    corp.insert(0, c)
    assert corp.docs == [c, a]
    corp[0] = b
    assert corp.docs == [b, a]
    corp[[0, 1]] = [a, b]
    assert corp.docs == [a, b]
    del corp[0]
    assert corp.docs == [b]
    corp.pushfirst([a, c])
    assert corp.docs == [a, c, b]
    del corp[[0, 2]]
    assert corp.docs == [c]
    assert corp.findfirst(Document(terms=[3])) == 0
    assert corp.findfirst(Document(terms=[2])) is None
    corp.push(c)
    assert corp.findall(c) == [0, 1]


def test_fixcorp_fuzz_preserves_invariants():
    """Randomized corpora through random fixcorp configurations must
    always yield a corpus that passes check_corp (the reference's
    invariant layer, Corpus.jl:111-122)."""
    import numpy as np

    rng = np.random.default_rng(123)
    words = ["the", "with", "apple", "zebra", "quantum", "physics",
             "cat", "dog", "science", "data"]
    for trial in range(25):
        V = int(rng.integers(3, 11))
        M = int(rng.integers(1, 12))
        docs = []
        for _ in range(M):
            n = int(rng.integers(0, 7))
            terms = (rng.integers(0, V, size=n) + 1).tolist()
            counts = (1 + rng.poisson(1.0, size=n)).tolist()
            docs.append(Document(terms=terms, counts=counts))
        vocab = {j + 1: words[j % len(words)] for j in range(V)}
        corp = Corpus(docs=docs, vocab=vocab)
        kw = dict(
            abridge=int(rng.integers(0, 3)),
            alphabetize=bool(rng.integers(2)),
            condense=bool(rng.integers(2)),
            pad=bool(rng.integers(2)),
            remove_empty_docs=bool(rng.integers(2)),
            remove_redundant=bool(rng.integers(2)),
            stop=bool(rng.integers(2)),
            trim=bool(rng.integers(2)),
        )
        fixcorp(corp, **kw)
        check_corp(corp)          # must never raise
        for doc in corp.docs:     # per-doc invariants too
            assert len(doc.terms) == len(doc.counts)
            assert all(c > 0 for c in doc.counts)


def test_expand_corp_inverts_condense():
    """expand_corp: one entry per token, repeats adjacent, token count
    preserved — the order-preserving form HMTM requires."""
    from topicmodelsvb_jl_tpu.corpus import expand_corp

    doc = Document(terms=[3, 1, 2], counts=[2, 1, 3])
    corp = Corpus(docs=[doc], vocab={1: "a", 2: "b", 3: "c"})
    expand_corp(corp)
    assert doc.terms == [3, 3, 1, 2, 2, 2]
    assert doc.counts == [1] * 6
    check_corp(corp)
    # idempotent on an already-expanded corpus
    expand_corp(corp)
    assert doc.terms == [3, 3, 1, 2, 2, 2]
    # duplicate-doc aliasing safe (unique_docs): same object twice
    corp2 = Corpus(docs=[doc, doc], vocab=dict(corp.vocab))
    expand_corp(corp2)
    assert corp2.docs[0].terms == [3, 3, 1, 2, 2, 2]


def test_showtitles_range_validation(capsys):
    """showtitles must validate 1-based indices like showdocs — index 0
    silently printed the LAST doc via negative indexing (regression)."""
    from topicmodelsvb_jl_tpu.corpus import CorpusError, showtitles

    corp = Corpus(docs=[Document(terms=[1], counts=[1], title="t1")],
                  vocab={1: "a"})
    showtitles(corp, 1)
    capsys.readouterr()
    for bad in (0, -1, 2):
        try:
            showtitles(corp, bad)
            assert False, f"index {bad} accepted"
        except CorpusError:
            pass


def test_writecorp_rejects_missing_stamps(tmp_path):
    """writecorp(stamps=True) with a stamp-less doc would write a literal
    'None' line readcorp cannot parse back (regression)."""
    from topicmodelsvb_jl_tpu.corpus import CorpusError, writecorp

    corp = Corpus(docs=[Document(terms=[1], counts=[1])], vocab={1: "a"})
    try:
        writecorp(corp, docfile=str(tmp_path / "d.txt"), stamps=True)
        assert False, "missing stamp accepted"
    except CorpusError:
        pass


def test_corpus_fingerprint_sees_stamps():
    """A stamp edit with unchanged terms must change the fingerprint —
    stamps drive DTM slice assignment on resume (regression)."""
    from topicmodelsvb_jl_tpu.checkpoint import corpus_fingerprint

    c1 = Corpus(docs=[Document(terms=[1], counts=[1], stamp=1.0)],
                vocab={1: "a"})
    c2 = Corpus(docs=[Document(terms=[1], counts=[1], stamp=2.0)],
                vocab={1: "a"})
    c3 = Corpus(docs=[Document(terms=[1], counts=[1])], vocab={1: "a"})
    fps = {corpus_fingerprint(c) for c in (c1, c2, c3)}
    assert len(fps) == 3
