"""Document-processing pipeline (operators/chunking.py): preprocess chain,
chunk reconstruction properties, metadata invariants, extractor stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.operators import chunking as C

DOCS = [
    (1, "the quick brown fox. jumps over the lazy dog! again and again? yes."),
    (2, "one short doc"),
    (3, "a" * 2500),  # forces multiple fixed chunks
    (4, ("sentence number %d. " * 40) % tuple(range(40))),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_preprocess_matches_reference_chain(spark):
    dirty = spark.createDataFrame(
        [(1, "--- Page 3 ---  hello   world @#$% ... ok\t(fine)")],
        "doc_id long, text string",
    )
    [row] = dirty.select(C.preprocess_text("text").alias("t")).collect()
    # marker stripped, whitespace collapsed, junk chars dropped, '...' -> '.'
    # (the double space is reference-faithful: the charset filter runs AFTER
    # whitespace collapse, so removing '@#$%' leaves its flanking spaces —
    # same output as document_processor.preprocess_text)
    assert row.t == "hello world  . ok (fine)"


def test_fixed_chunks_reconstruct_original(docs):
    size, overlap = 600, 200
    stride = size - overlap
    rows = (
        C.fixed_chunks(docs, chunk_size=size, overlap=overlap)
        .orderBy("doc_id", "chunk_index")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    originals = dict(DOCS)
    assert set(by_doc) == set(originals)
    for doc_id, chunks in by_doc.items():
        # first chunk whole + stride-aligned tails of the rest
        rebuilt = chunks[0].chunk_text + "".join(
            c.chunk_text[overlap:] for c in chunks[1:]
        )
        assert rebuilt == originals[doc_id]
        for c in chunks:
            assert len(c.chunk_text) <= size


def test_sentence_chunks_cover_all_sentences(docs):
    out = C.sentence_chunks(docs, chunk_size=200).collect()
    joined = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_index)):
        joined[r.doc_id] = joined.get(r.doc_id, "")
        joined[r.doc_id] += (" " if joined[r.doc_id] else "") + r.chunk_text
        assert r.n_sentences >= 1
    # chunk texts concatenated == the sentence stream (boundary spaces
    # normalized to single spaces by the split+join)
    import re

    for doc_id, text in dict(DOCS).items():
        sentences = [s.strip() for s in re.split(r"(?<=[.!?])\s+", text) if s.strip()]
        assert joined[doc_id] == " ".join(sentences)


def test_chunk_metadata_invariants(docs):
    meta = C.process_documents(docs, strategy="fixed", chunk_size=600, overlap=200)
    rows = meta.collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
        assert r.chunk_size == len(r.chunk_text)
        assert r.chunk_size_tokens == len(r.chunk_text.split())
        assert r.chunking_strategy == "fixed"
        assert r.language == "en"
    for chunks in per_doc.values():
        assert all(c.total_chunks == len(chunks) for c in chunks)
        assert sorted(c.chunk_index for c in chunks) == list(range(len(chunks)))


MD_DOCS = [
    # small sections pack together
    (1, "# intro\nshort one.\n# next\nshort two.\n# more\nshort three."),
    # an oversize section gets fixed-split; neighbors don't pack across it
    (2, "# a\ntiny.\n# big\n" + "x" * 700 + "\n# z\ntail."),
    (3, "no headers at all, single section"),
]


@pytest.fixture(scope="module")
def md_docs(spark):
    return spark.createDataFrame(MD_DOCS, "doc_id long, text string").cache()


def test_document_chunks_pack_and_split(md_docs):
    out = C.document_chunks(md_docs, chunk_size=300, overlap=100).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_index)):
        by_doc.setdefault(r.doc_id, []).append(r.chunk_text)

    # doc 1: three small sections (< 300 chars total) pack into one chunk,
    # headers preserved, section order kept
    assert len(by_doc[1]) == 1
    assert by_doc[1][0] == "# intro\nshort one.\n# next\nshort two.\n# more\nshort three."

    # doc 2: the 700-char section exceeds chunk_size -> fixed-split pieces
    # (stride 200: 704-char section -> 4 pieces) between the small sections
    chunks2 = by_doc[2]
    assert chunks2[0] == "# a\ntiny."
    big_pieces = [c for c in chunks2 if c.startswith("# big") or set(c) <= {"x"}]
    assert len(big_pieces) >= 3
    assert chunks2[-1] == "# z\ntail."
    # chunk_index is a contiguous 0..n-1 per doc in section order
    assert [r.chunk_index for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_index))
            if r.doc_id == 2] == list(range(len(chunks2)))

    # doc 3: no headers -> one section, one chunk
    assert by_doc[3] == ["no headers at all, single section"]


def test_process_documents_rejects_unknown_strategy(docs):
    with pytest.raises(ValueError, match="unknown chunking strategy"):
        C.process_documents(docs, strategy="token")


def test_extract_text_all_types_real(spark):
    import numpy as np

    from stock_crypto_data_pipeline_public_spark.operators import ocr
    from stock_crypto_data_pipeline_public_spark.operators.jpegcodec import encode_jpeg
    from stock_crypto_data_pipeline_public_spark.operators.multimodal import _encode_png

    glyph_png = _encode_png(
        ocr._render_raster(ocr.normalize_for_raster("Scan 42!", 12))
    )
    gray = ocr._render_raster(ocr.normalize_for_raster("Jay peg 7", 12))[:, :, 0]
    glyph_jpg = encode_jpeg(
        np.kron(np.where(gray > 0, 254, 0).astype(np.uint8), np.ones((8, 8), np.uint8))
    )
    bin_docs = spark.createDataFrame(
        [
            (1, "txt", bytearray(b"plain text payload")),
            (2, "pdf", bytearray(C._make_pdf([["hello pdf", "line (two)"]]))),
            (3, "docx", bytearray(C._make_docx(["first para", "second para"]))),
            (4, "png", bytearray(glyph_png)),
            (5, "jpg", bytearray(glyph_jpg)),
        ],
        "doc_id long, doc_type string, content binary",
    )
    got = {r.doc_id: r.text for r in C.extract_text(bin_docs).collect()}
    assert got[1] == "plain text payload"
    assert got[2] == "--- Page 1 ---\nhello pdf\nline (two)"
    assert got[3] == "first para\nsecond para"
    # images are REAL now: full codec decode + glyph template match
    assert got[4] == "SCAN 42     "
    assert got[5] == "JAY PEG 7   "

    # fake=True keeps the deterministic placeholder for image types
    fake = {r.doc_id: r.text for r in C.extract_text(bin_docs, fake=True).collect()}
    assert fake[2] == got[2] and fake[3] == got[3]  # real formats unaffected
    assert fake[4].startswith("png document ")
    assert fake[5].startswith("jpg document ")
    again = {r.doc_id: r.text for r in C.extract_text(bin_docs, fake=True).collect()}
    assert fake == again

    # an image that is NOT a glyph raster fails honestly (no fabricated
    # text): raise mode propagates, PERMISSIVE mode nulls the row like any
    # other undecodable payload
    photo = spark.createDataFrame(
        [
            (8, "png", bytearray(b"\x89PNG photographic")),
            (9, "jpg", bytearray(b"\xff\xd8 photographic")),
        ],
        "doc_id long, doc_type string, content binary",
    )
    with pytest.raises(Exception, match="IHDR|glyph|raster|not a PNG|jpeg"):
        C.extract_text(photo).collect()
    skipped = {r.doc_id: r.text for r in C.extract_text(photo, on_error="skip").collect()}
    assert skipped == {8: None, 9: None}


def test_docx_codec_round_trip():
    for d in (0, 7, 123, 4567):
        paras = [f"Para {i} of doc {d}." for i in range(1 + d % 4)]
        assert C._extract_docx(C._make_docx(paras)) == "\n".join(paras)
    # XML entity escaping + run re-joining survive round trip
    tricky = ["a < b & c > d", 'quotes "x" and \'y\'']
    assert C._extract_docx(C._make_docx(tricky)) == "\n".join(tricky)


def test_pdf_codec_round_trip():
    for d in (0, 1, 55, 1234):
        pages = [
            [f"Doc {d} page {p}", f"Flate body {p}-{d}"] for p in range(1, 2 + d % 3)
        ]
        want = "\n\n".join(
            f"--- Page {p} ---\n" + "\n".join(pg) for p, pg in enumerate(pages, 1)
        )
        assert C._extract_pdf(C._make_pdf(pages)) == want
    # full literal-string escape grammar + 4-line pages (Tj, TJ, ', T*)
    tricky = r"a(b)c\d \( nested (deep)"
    got = C._extract_pdf(C._make_pdf([["l0", tricky, "l2", "l3"]]))
    assert got == f"--- Page 1 ---\nl0\n{tricky}\nl2\nl3"


def test_pdf_string_token_grammar():
    s, _ = C._pdf_string_token(r"(a\101\n\(x\)\\) rest", 0)
    assert s == "aA\n(x)\\"
    s, _ = C._pdf_string_token("<48656C 6C6F7>x", 0)  # odd hex pads a 0
    assert s == "Hellop"
    s, _ = C._pdf_string_token("(nested (deep) ok)", 0)
    assert s == "nested (deep) ok"
    # \8 / \9 are NOT octal (ISO 32000): decode as literal chars, no crash
    s, _ = C._pdf_string_token(r"(a\8b\9c\0777)", 0)
    assert s == "a8b9c" + chr(0o77) + "7"


def test_pdf_content_scanner_never_stalls():
    """Marked-content dicts inside BT…ET (Word/LibreOffice tagged PDFs)
    and stray single chars must not hang the scanner (ADVICE r6 high:
    the bare-token branch looped forever on '>' / ')')."""
    import multiprocessing

    blocks = [
        b"BT /P <</MCID 0>> BDC (x) Tj EMC ET",        # dict close '>>'
        b"BT ) (y) Tj ET",                               # stray ')'
        b"BT > } (z) Tj ET",                             # lone '>' and '}'
    ]

    def run(q):
        q.put([C._pdf_content_text(b) for b in blocks])

    q = multiprocessing.Queue()
    p = multiprocessing.Process(target=run, args=(q,))
    p.start()
    p.join(timeout=30)
    alive = p.is_alive()
    if alive:
        p.terminate()
    assert not alive, "PDF content scanner hung on marked-content input"
    assert q.get() == ["x", "y", "z"]


def test_crossdoc_span_dedup_keeper_semantics(spark, tmp_path):
    """Constructed duplicates prove the keeper rules: first corpus-wide
    occurrence (min doc_id, then min chunk_start) survives, intra-doc
    repeats drop, and a fully-duplicated doc survives as an empty row."""
    import hashlib

    from stock_crypto_data_pipeline_public_spark.plans.textops import (
        t35_crossdoc_span_dedup,
    )

    A = "a" * 64
    B = "b" * 64
    C = "c" * 64
    rows = [
        (1, A + B),          # doc 1: owns A and B
        (2, A + C + C),      # doc 2: A duplicates doc 1; C twice (intra-dup)
        (3, B),              # doc 3: fully duplicated -> empty survivor
        (4, ""),             # empty text -> zero spans, still present
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
    # the query reads <sf_dir>/documents.parquet — build that layout
    import os, shutil
    sf = tmp_path / "sf"
    os.makedirs(sf)
    shutil.move(path, str(sf / "documents.parquet"))

    got = {r["doc_id"]: r for r in t35_crossdoc_span_dedup(spark, str(sf)).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1]["n_spans"], got[1]["n_kept"]) == (2, 2)
    assert got[1]["clean_md5"] == hashlib.md5((A + B).encode()).hexdigest()
    assert (got[2]["n_spans"], got[2]["n_kept"]) == (3, 1)  # keeps only C once
    assert got[2]["clean_md5"] == hashlib.md5(C.encode()).hexdigest()
    assert (got[3]["n_spans"], got[3]["n_kept"], got[3]["clean_len"]) == (1, 0, 0)
    assert got[3]["clean_md5"] == hashlib.md5(b"").hexdigest()
    assert (got[4]["n_spans"], got[4]["n_kept"]) == (0, 0)


def test_cdc_segment_dedup_is_alignment_invariant(spark, tmp_path):
    """The property t35's fixed grid lacks: a passage duplicated at a
    DIFFERENT offset still dedups, because segment boundaries are decided
    by token content, not position. Verified against an exact Python
    reimplementation of the segmentation + keeper rules."""
    import hashlib
    import os
    import random

    from stock_crypto_data_pipeline_public_spark.plans.textops import (
        t36_cdc_segment_dedup,
    )

    rng = random.Random(9)
    passage = " ".join(f"w{rng.randrange(1000)}" for _ in range(120))
    rows = [(1, passage), (2, "unrelated prefix words here " + passage)]

    def segments(text):
        toks = [t for t in text.strip().split() if t]
        segs, cur, start = [], [], 1
        for i, t in enumerate(toks, 1):
            if not cur:
                start = i
            cur.append(t)
            if hashlib.md5(t.encode()).hexdigest()[0] in "01":
                segs.append((start, " ".join(cur)))
                cur = []
        if cur:
            segs.append((start, " ".join(cur)))
        return segs

    s1, s2 = segments(rows[0][1]), segments(rows[1][1])
    owned1 = {s for _, s in s1}
    expect_kept2 = [seg for _, seg in s2 if seg not in owned1]
    assert len(expect_kept2) < len(s2), "interior segments must dedup across docs"

    sf = tmp_path / "sf"
    os.makedirs(sf)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(sf / "documents.parquet")
    )
    got = {r["doc_id"]: r for r in t36_cdc_segment_dedup(spark, str(sf)).collect()}
    assert got[1]["n_kept"] == got[1]["n_segments"] == len(s1)
    assert got[2]["n_segments"] == len(s2)
    assert got[2]["n_kept"] == len(expect_kept2)
    assert (
        got[2]["clean_md5"]
        == hashlib.md5(" ".join(expect_kept2).encode()).hexdigest()
    )


def test_cdc_segment_dedup_random_corpus_matches_python_model(spark, tmp_path):
    """Seeded multi-doc corpus with engineered cross-doc and intra-doc
    duplication: the full Spark query must equal an exact Python model of
    segmentation + corpus-wide keeper selection on every output column."""
    import hashlib
    import os
    import random

    from stock_crypto_data_pipeline_public_spark.plans.textops import (
        t36_cdc_segment_dedup,
    )

    rng = random.Random(21)
    vocab = [f"w{n}" for n in range(60)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(20, 60)))
        for _ in range(8)
    ]
    rows = []
    for doc_id in range(1, 31):
        parts = [rng.choice(passages) for _ in range(rng.randrange(1, 4))]
        if rng.random() < 0.3:
            parts.append(parts[0])  # intra-doc duplication
        rows.append((doc_id, " ".join(parts)))
    rows.append((99, ""))  # empty doc

    def segments(text):
        toks = [t for t in text.strip().split() if t]
        segs, cur, start = [], [], 1
        for i, t in enumerate(toks, 1):
            if not cur:
                start = i
            cur.append(t)
            if hashlib.md5(t.encode()).hexdigest()[0] in "01":
                segs.append((start, " ".join(cur)))
                cur = []
        if cur:
            segs.append((start, " ".join(cur)))
        return segs

    # corpus-wide keeper: min (doc_id, seg_start) per segment value
    keeper = {}
    per_doc = {}
    for doc_id, text in rows:
        per_doc[doc_id] = segments(text)
        for start, seg in per_doc[doc_id]:
            if seg not in keeper or (doc_id, start) < keeper[seg]:
                keeper[seg] = (doc_id, start)
    expect = {}
    for doc_id, segs in per_doc.items():
        kept = [s for st, s in segs if keeper[s] == (doc_id, st)]
        expect[doc_id] = (
            len(segs),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    sf = tmp_path / "sf"
    os.makedirs(sf)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(sf / "documents.parquet")
    )
    got = {
        r["doc_id"]: (r["n_segments"], r["n_kept"], r["clean_md5"])
        for r in t36_cdc_segment_dedup(spark, str(sf)).collect()
    }
    assert got == expect


def test_extract_text_on_error_skip(spark):
    """At corpus scale one corrupt document must not kill the job:
    on_error='skip' NULLs the failing row, healthy rows still decode,
    and the OCR honesty guard is NOT maskable."""
    docs = spark.createDataFrame(
        [
            (1, "docx", bytearray(C._make_docx(["good para"]))),
            (2, "docx", bytearray(b"not a zip at all")),
            (3, "pdf", bytearray(C._make_pdf([["good pdf line"]]))),
            (4, "pdf", bytearray(b"%PDF-1.4 truncated garbage (")),
        ],
        "doc_id long, doc_type string, content binary",
    )
    # default: the corrupt zip propagates (reference per-file behavior)
    with pytest.raises(Exception, match="BadZipFile|zip"):
        C.extract_text(docs).collect()

    rows = {r.doc_id: r for r in C.extract_text(docs, on_error="skip").collect()}
    assert rows[1].text == "good para" and rows[1].n_chars == 9
    assert rows[2].text is None and rows[2].n_chars is None
    assert rows[3].text == "--- Page 1 ---\ngood pdf line"
    # doc 4: no parseable objects -> honest empty extraction, not an error
    assert rows[4].text == ""

    with pytest.raises(ValueError, match="on_error"):
        C.extract_text(docs, on_error="ignore")

    # a non-raster image in PERMISSIVE mode nulls like any undecodable
    # row (no fabricated text, job stays alive); raise mode propagates
    ocr = spark.createDataFrame(
        [(9, "jpg", bytearray(b"\xff\xd8"))],
        "doc_id long, doc_type string, content binary",
    )
    assert C.extract_text(ocr, on_error="skip").collect()[0].text is None
    with pytest.raises(Exception, match="jpeg|glyph|raster"):
        C.extract_text(ocr).collect()


try:
    from hypothesis import given, settings, strategies as st

    _line = st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        min_size=1,
        max_size=60,
    ).map(str.strip).filter(lambda s: s)

    @given(pages=st.lists(st.lists(_line, min_size=1, max_size=5), min_size=1, max_size=3))
    @settings(max_examples=60, deadline=None)
    def test_pdf_codec_round_trip_property(pages):
        """Any printable-ASCII page content survives encode→extract exactly
        (escapes, kerned TJ splits, all three show operators)."""
        want = "\n\n".join(
            f"--- Page {p} ---\n" + "\n".join(pg) for p, pg in enumerate(pages, 1)
        )
        assert C._extract_pdf(C._make_pdf(pages)) == want

    @given(paras=st.lists(_line, min_size=1, max_size=8))
    @settings(max_examples=60, deadline=None)
    def test_docx_codec_round_trip_property(paras):
        """Any printable-ASCII paragraphs survive encode→extract exactly
        (XML escaping, run splits, blank-paragraph drop)."""
        assert C._extract_docx(C._make_docx(paras)) == "\n".join(paras)

except ImportError:  # pragma: no cover - hypothesis is baked into this env
    pass
