"""Python UDTF surface (Spark 4 ``pyspark.sql.functions.udtf``).

The reference registers no UDFs of any kind (SURVEY.md §2.10); the engine
covers the full Spark 4 Python UDF surface anyway — scalar pandas_udf
(q_pandas_udf), grouped-map applyInPandas (q_embed_normalize), mapInPandas
(multimodal decode), and, here, the TABLE function: one input row → many
output rows through a lateral join, the API for row-expanding transforms a
scalar UDF cannot type.

Discipline note (docs/SCALE.md "Python boundary policy"): a Python UDTF is
row-path Python — each eval() call crosses the serialization boundary
per ROW, without Arrow batching. It is API-surface coverage and an escape
hatch for genuinely iterator-shaped logic; the HOT-path implementation of
this exact transform is ``llm/filtering.chunk_documents`` (codegen
sequence+explode+slice, zero Python), and the two are pinned equal by the
q_python_udtf oracle being q_text_chunks' oracle at a different width.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

#: ASCII-whitespace tokenizer: ``\S+`` under re.ASCII matches runs not
#: containing [ \t\n\r\f\v] ONLY — the same whitespace class Java's
#: ``\s`` uses in the codegen twin (llm/filtering.chunk_documents) and
#: the q_python_udtf oracle. Python's ``str.split()`` would split on ANY
#: Unicode whitespace (NBSP, ideographic space, …) and silently diverge
#: from the other two formulations on such documents.
_ASCII_TOKEN = re.compile(r"\S+", re.ASCII)


@udtf(returnType="chunk_idx int, n_tokens int, chunk_text string")
class ChunkTextUDTF:
    """Fixed-size token chunker as a table function: emits one row per
    ``max_tokens``-token window of the whitespace-tokenized input (final
    window keeps the remainder; zero-token docs emit nothing) — the same
    contract as ``llm/filtering.chunk_documents``.

    Whitespace contract: tokens are maximal runs of non-ASCII-whitespace
    (``\\S+`` with ``re.ASCII``), matching Java ``\\s+`` semantics so all
    three formulations (UDTF, codegen twin, SQL oracle) agree on documents
    containing tabs, newlines, or non-breaking spaces."""

    def eval(self, text: str, max_tokens: int):  # noqa: D102
        toks = _ASCII_TOKEN.findall(text) if text else []
        for i in range(0, len(toks), max_tokens):
            window = toks[i : i + max_tokens]
            yield i // max_tokens, len(window), " ".join(window)


def register_udtfs(spark) -> None:
    """Idempotently register the engine's UDTFs on a session (SQL name →
    class); re-registration replaces the prior entry."""
    spark.udtf.register("chunk_text_udtf", ChunkTextUDTF)
