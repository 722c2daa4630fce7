"""Document-processing pipeline: extract → preprocess → chunk → metadata.

Spark-first analog of the reference chatbot's document subsystem
(reference scripts/chatbot/src/document_processor.py:18-151,
text_extractors.py, chunking_strategies.py): the reference processes one
file at a time in Python; here every step is a DataFrame transform so a
100 TB corpus chunks with the scan — per-row JVM expressions, one window
for chunk counts, no per-document Python.

- :func:`preprocess_text` — the reference's cleanup chain
  (document_processor.py:42-67) as built-in column expressions.
- :func:`fixed_chunks` / :func:`sentence_chunks` — chunking_strategies.py's
  recursive/sentence strategies in their distributed formulations (see
  plans/textops.py t24/t25 for the hash-gated query forms).
- :func:`with_chunk_metadata` — document_processor.py:69-94's metadata
  dict as typed columns (one window to count chunks per doc).
- :func:`extract_text` — text_extractors.py's PDF/DOCX extraction; the
  parsing libs (pdfplumber/PyMuPDF/python-docx) are not in this container,
  so the decode is stubbed exactly like operators/multimodal.py: real
  mapInPandas plumbing + schema, `NotImplementedError` unless ``fake=True``
  supplies the deterministic stand-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

PAGE_MARKER_RE = r"--- Page \d+ ---"


def preprocess_text(col: Column | str) -> Column:
    """Reference preprocess chain (document_processor.py:42-67), same order:
    whitespace collapse → charset filter → punctuation dedupe → page-marker
    removal → trim. (The reference also applies unicodedata NFKD between
    the filter and the dedupe; Spark has no built-in normalizer and the
    corpus is ASCII — documented skip.)"""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.regexp_replace(c, r"[^\w\s\.\,\!\?\;\:\-\(\)]", "")
    c = F.regexp_replace(c, r"\.{2,}", ".")
    c = F.regexp_replace(c, PAGE_MARKER_RE, "")
    return F.trim(c)


def fixed_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    chunk_size: int = 1000,
    overlap: int = 200,
) -> DataFrame:
    """Fixed-stride char windows (chunking_strategies.py:123-147 semantics):
    one output row per chunk with ``chunk_index`` and ``chunk_text``.
    sequence → posexplode → substring: stays inside whole-stage codegen."""
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    stride = chunk_size - overlap
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(text_col), F.lit(1)), F.lit(stride)
    )
    exploded = df.select(
        *id_cols, text_col, F.posexplode(starts).alias("chunk_index", "__start")
    )
    chunk = F.col(text_col).substr(F.col("__start"), F.lit(chunk_size))
    return exploded.select(
        *id_cols, "chunk_index", chunk.alias("chunk_text")
    ).filter(F.length("chunk_text") > 0)


_SOH = "\u0001"  # sentence separator marker; never occurs in real text


def sentence_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    chunk_size: int = 1000,
) -> DataFrame:
    """Sentence-aligned chunks (chunking_strategies.py:23-70 semantics,
    distributed formulation): sentences split on ``([.!?])\\s+`` boundaries,
    assigned to chunk ``floor(cum_chars_before / chunk_size)`` — one
    posexplode, one window sum, one groupBy. Output: id_cols, chunk_index,
    chunk_text, n_sentences."""
    marked = F.regexp_replace(F.col(text_col), r"([.!?])\s+", "$1" + _SOH)
    sent = (
        df.select(*id_cols, F.posexplode(F.split(marked, _SOH)).alias("__idx", "__raw"))
        .select(*id_cols, "__idx", F.trim("__raw").alias("__sentence"))
        .filter(F.length("__sentence") > 0)
    )
    w = W.partitionBy(*id_cols).orderBy("__idx").rowsBetween(W.unboundedPreceding, -1)
    cum = sent.withColumn(
        "__cum", F.coalesce(F.sum(F.length("__sentence") + 1).over(w), F.lit(0))
    ).withColumn("chunk_index", F.floor(F.col("__cum") / F.lit(chunk_size)).cast("int"))
    ordered_text = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__idx", "__sentence"))),
            lambda s: s["__sentence"],
        ),
        " ",
    )
    return cum.groupBy(*id_cols, "chunk_index").agg(
        ordered_text.alias("chunk_text"),
        F.count(F.lit(1)).cast("int").alias("n_sentences"),
    )


def document_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    chunk_size: int = 1000,
    overlap: int = 200,
) -> DataFrame:
    """Structure-aware chunking (chunking_strategies.py:150-204 semantics,
    DocumentAwareChunking): split on markdown section headers, pack small
    sections into ~chunk_size chunks, split oversize sections with the
    fixed-stride splitter.

    Distributed formulation: sections are marked (RE2-safe — a newline
    before ``#+ `` is rewritten to SOH, no lookahead needed) and
    posexploded; a window cum-sum over ALL sections assigns each small
    section to bucket ``floor(cum_chars_before / chunk_size)`` — an
    intervening oversize section advances the cum past a bucket boundary,
    so packing does not leak across it (the reference's "big section
    interrupts the current chunk" behaviour); oversize sections go through
    :func:`fixed_chunks` per section. Chunks re-index per document in
    section order. Output: id_cols, chunk_index, chunk_text."""
    marked = F.regexp_replace(F.col(text_col), r"\n(#+\s)", _SOH + "$1")
    sec = (
        df.select(*id_cols, F.posexplode(F.split(marked, _SOH)).alias("__sidx", "__raw"))
        .select(*id_cols, "__sidx", F.trim("__raw").alias("__section"))
        .filter(F.length("__section") > 0)
    )
    w = W.partitionBy(*id_cols).orderBy("__sidx").rowsBetween(W.unboundedPreceding, -1)
    cum = sec.withColumn(
        "__cum", F.coalesce(F.sum(F.length("__section") + 1).over(w), F.lit(0))
    )
    small = cum.filter(F.length("__section") <= chunk_size)
    big = cum.filter(F.length("__section") > chunk_size)

    packed = (
        small.withColumn(
            "__bucket", F.floor(F.col("__cum") / F.lit(chunk_size)).cast("int")
        )
        .groupBy(*id_cols, "__bucket")
        .agg(
            F.min("__sidx").alias("__order"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__sidx", "__section"))),
                    lambda s: s["__section"],
                ),
                "\n",
            ).alias("chunk_text"),
        )
        .select(*id_cols, F.col("__order").alias("__sec"), F.lit(0).alias("__sub"), "chunk_text")
    )
    split_big = fixed_chunks(
        big.select(*id_cols, "__sidx", F.col("__section").alias("__text")),
        text_col="__text",
        id_cols=tuple(id_cols) + ("__sidx",),
        chunk_size=chunk_size,
        overlap=overlap,
    ).select(
        *id_cols,
        F.col("__sidx").alias("__sec"),
        (F.col("chunk_index") + 1).alias("__sub"),
        "chunk_text",
    )
    all_chunks = packed.unionByName(split_big)
    order_w = W.partitionBy(*id_cols).orderBy("__sec", "__sub")
    return all_chunks.select(
        *id_cols,
        (F.row_number().over(order_w) - 1).cast("int").alias("chunk_index"),
        "chunk_text",
    )


def with_chunk_metadata(
    chunks: DataFrame,
    id_cols: tuple[str, ...] = ("doc_id",),
    strategy: str = "fixed",
    language: str = "en",
) -> DataFrame:
    """Typed-column form of document_processor.py:69-94's metadata dict:
    chunk_size (chars), chunk_size_tokens (whitespace words — the
    reference's rough count), total_chunks per document (one window), plus
    the constant strategy/language tags. No ``timestamp`` field: a
    wall-clock column would make results non-deterministic; stamp at the
    sink if needed."""
    w = W.partitionBy(*id_cols)
    return chunks.select(
        *id_cols,
        "chunk_index",
        "chunk_text",
        F.length("chunk_text").alias("chunk_size"),
        F.size(F.split(F.trim("chunk_text"), r"\s+")).alias("chunk_size_tokens"),
        F.count(F.lit(1)).over(w).cast("int").alias("total_chunks"),
        F.lit(strategy).alias("chunking_strategy"),
        F.lit(language).alias("language"),
    )


def process_documents(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    strategy: str = "fixed",
    chunk_size: int = 1000,
    overlap: int = 200,
    language: str = "en",
) -> DataFrame:
    """The full process_document pipeline (document_processor.py:96-150) as
    one DataFrame transform: preprocess → chunk → metadata.

    Note the reference-faithful quirk: preprocess collapses ``\\s+`` (incl.
    newlines), so the ``document`` strategy sees no header boundaries when
    run through this pipeline — exactly as in the reference, where
    process_document also preprocesses before DocumentAwareChunking. Call
    :func:`document_chunks` directly on raw text for structure-aware
    splitting."""
    cleaned = df.withColumn(text_col, preprocess_text(text_col)).filter(
        F.length(text_col) > 0
    )
    if strategy == "fixed":
        chunks = fixed_chunks(cleaned, text_col, id_cols, chunk_size, overlap)
    elif strategy == "sentence":
        chunks = sentence_chunks(cleaned, text_col, id_cols, chunk_size)
    elif strategy == "document":
        chunks = document_chunks(cleaned, text_col, id_cols, chunk_size, overlap)
    else:
        raise ValueError(f"unknown chunking strategy {strategy!r}")
    return with_chunk_metadata(chunks, id_cols, strategy, language)


# --------------------------------------------------------------------------
# Text extraction (text_extractors.py) — binary document → text.
# --------------------------------------------------------------------------

_EXTRACT_SCHEMA = "doc_id long, doc_type string, text string, n_chars int"


def extract_text(
    df: DataFrame,
    content_col: str = "content",
    type_col: str = "doc_type",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Extract text from binary documents (PDF/DOCX/TXT) via mapInPandas.

    Mirrors text_extractors.py's extractor registry. ``txt`` decodes
    for real (UTF-8). PDF/DOCX need pdfplumber / PyMuPDF / python-docx —
    absent from this container — so those raise ``NotImplementedError``
    unless ``fake=True``, which substitutes a deterministic placeholder
    (sha256-derived) keeping schema, batching, and partitioning real. Same
    honesty contract as operators/multimodal.py.
    """

    def run(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            texts = []
            for content, dtype in zip(pdf[content_col], pdf[type_col]):
                payload = bytes(content) if content is not None else b""
                if dtype == "txt":
                    texts.append(payload.decode("utf-8", errors="replace"))
                elif dtype in ("pdf", "docx"):
                    if not fake:
                        raise NotImplementedError(
                            f"{dtype} extraction needs pdfplumber/PyMuPDF/python-docx "
                            "(not in this container); pass fake=True for the "
                            "deterministic stand-in"
                        )
                    digest = hashlib.sha256(payload).hexdigest()
                    texts.append(f"{dtype} document {digest[:16]}")
                else:
                    texts.append("")
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "doc_type": pdf[type_col].astype(str),
                    "text": texts,
                }
            )
            out["n_chars"] = out["text"].str.len().astype("int32")
            yield out

    return df.mapInPandas(run, _EXTRACT_SCHEMA)
