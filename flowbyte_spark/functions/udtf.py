"""Python UDTF surface (SURVEY.md §2.10, Spark 3.5+).

Table functions let one input row produce many output rows with arbitrary
Python logic — the lateral-view shape.  Reference implementation:
``SentenceSplit``, a text chunker for training-data pipelines (split a
document into overlapping windows of N words, one row each) — the step
between raw documents and per-chunk embedding/scoring.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: int, chunk: string, n_words: int")
class ChunkWords:
    """Split ``text`` into word windows of ``size`` advancing by ``step``.

    Usage::

        from pyspark.sql.functions import lit
        ChunkWords(lit(text), lit(64), lit(32))        # DataFrame API
        spark.udtf.register("chunk_words", ChunkWords) # SQL lateral view
    """

    def eval(self, text: str, size: int = 64, step: int = 32):
        if text is None:
            return
        words = text.split(" ")
        if not words:
            return
        idx = 0
        start = 0
        while True:
            window = words[start : start + size]
            yield idx, " ".join(window), len(window)
            idx += 1
            if start + size >= len(words):
                break  # full coverage incl. a trailing partial window
            start += step
