"""WARC (ISO 28500) ingest edge as a Spark 4 Python DataSource.

The missing FIRST hop of the web-crawl story this package's LLM ladder
processes: CommonCrawl and every crawler that feeds a training corpus
deliver **WARC** — a sequence of length-delimited records, each a WARC
header block (``WARC/1.0`` + named fields + ``Content-Length``) followed
by a content block that is, for ``WARC-Type: response`` records, a full
HTTP response (status line, headers, body). Downstream of this source
the repo's pipeline is already complete: ``llm.dedup.canonical_url``
(URL dedup) → ``llm.textops.extract_html_text`` (markup extraction) →
quality gates → the dedup ladder.

Design (same discipline as ``pydatasource.PosStateFileDataSource``):

- **one ``InputPartition`` per ``.warc`` file** — executor-parallel, no
  driver funnel; the driver does one ``os.listdir`` at planning time.
  Real crawls shard into many ~1 GB WARC files (CommonCrawl ships
  ~64,000 per snapshot), so per-file parallelism is the natural unit;
  record-level splitting inside one file would need a synchronizing
  scan anyway (records are length-delimited, not offset-indexed).
- the parser walks records by ``Content-Length`` — never a regex over
  the payload, so binary bodies (images, gzip members stored raw) pass
  through byte-exact;
- malformed records raise ``ValueError`` at the file level (an
  ingest-edge truncation is a bad FILE); the reader surfaces it rather
  than yielding silently-partial data.

Schema: ``warc_file`` (basename), ``warc_type``, ``target_uri``,
``warc_date``, ``http_status`` (NULL for non-HTTP records),
``content_type`` (the HTTP Content-Type for response records, else the
record-level one), ``payload`` (HTTP body bytes for responses, else the
raw block). Reference parity: none — the reference has no web-crawl
surface; SURVEY §2.11 extension (q_scan_warc).
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

WARC_SCHEMA = (
    "warc_file STRING, warc_type STRING, target_uri STRING, warc_date STRING, "
    "http_status INT, content_type STRING, payload BINARY"
)

_CRLF2 = b"\r\n\r\n"


def build_warc_record(
    warc_type: str,
    target_uri: str | None,
    warc_date: str,
    body: bytes,
    http_status: int | None = None,
    content_type: str | None = None,
) -> bytes:
    """Serialize ONE WARC record. ``http_status`` set → a ``response``
    record whose block is a minimal HTTP response wrapping ``body``;
    otherwise the block is ``body`` verbatim (warcinfo/metadata shapes).
    The writer is the parser's test twin — round-trip pinned in
    tests/test_sources.py."""
    if http_status is not None:
        http = (
            f"HTTP/1.1 {http_status} X\r\n"
            f"Content-Type: {content_type or 'application/octet-stream'}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("latin-1") + body
        block, block_ct = http, "application/http;msgtype=response"
    else:
        block, block_ct = body, (content_type or "application/octet-stream")
    fields = [("WARC-Type", warc_type), ("WARC-Date", warc_date)]
    if target_uri is not None:
        fields.append(("WARC-Target-URI", target_uri))
    fields.append(("Content-Type", block_ct))
    fields.append(("Content-Length", str(len(block))))
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in fields)
    return head.encode("latin-1") + b"\r\n" + block + _CRLF2


def parse_warc(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Walk a WARC byte stream record by record: yields
    ``(lowercased header fields, content block)``. Length-delimited —
    the block is sliced by ``Content-Length``, never scanned. Raises
    ``ValueError`` on a bad version line, a missing length, or a
    truncated block."""
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):  # inter-record separators
            pos += 2
        if pos >= n:
            return
        end_hdr = data.find(_CRLF2, pos)
        if end_hdr < 0:
            raise ValueError("truncated WARC header block")
        lines = data[pos:end_hdr].decode("latin-1").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC record without a valid Content-Length") from exc
        body_start = end_hdr + len(_CRLF2)
        if body_start + clen > n:
            raise ValueError("truncated WARC content block")
        yield fields, data[body_start : body_start + clen]
        pos = body_start + clen


def maybe_gunzip_warc(data: bytes, fname: str) -> bytes:
    """Transparent ``.warc.gz`` support (r12): CommonCrawl ships WARC as
    a CONCATENATION of per-record gzip members (so HTTP range reads can
    fetch one record). Python's gzip module decompresses concatenated
    members in one pass, which reconstitutes exactly the plain WARC byte
    stream ``parse_warc`` walks. Triggered by extension OR magic (a
    mis-named plain file passes through; a gzip-magic file always
    inflates)."""
    if data[:2] == b"\x1f\x8b" or fname.endswith(".gz"):
        if data[:2] != b"\x1f\x8b":
            raise ValueError(f"{fname}: .gz extension without gzip magic")
        import gzip
        import io

        out = []
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
            while True:
                chunk = gz.read(1 << 20)
                if not chunk:
                    break
                out.append(chunk)
        return b"".join(out)
    return data


def _parse_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) of an HTTP response block; a block
    that doesn't parse as HTTP comes back as (None, None, block) — the
    record is still delivered, typed as opaque."""
    end = block.find(_CRLF2)
    if end < 0:
        return None, None, block
    head = block[:end].decode("latin-1", errors="replace").split("\r\n")
    parts = head[0].split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        return None, None, block
    try:
        status = int(parts[1])
    except ValueError:
        return None, None, block
    ctype = None
    for ln in head[1:]:
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, block[end + len(_CRLF2) :]


class _WarcPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires option 'path'")
        self._dir = path

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _WarcPartition(os.path.join(self._dir, f))
            for f in sorted(os.listdir(self._dir))
            if f.endswith((".warc", ".warc.gz"))
        ]

    def read(self, partition: _WarcPartition) -> Iterator[tuple]:
        fname = os.path.basename(partition.path)
        with open(partition.path, "rb") as f:
            data = f.read()
        data = maybe_gunzip_warc(data, fname)
        for fields, block in parse_warc(data):
            wtype = fields.get("warc-type", "")
            uri = fields.get("warc-target-uri")
            wdate = fields.get("warc-date")
            rec_ct = fields.get("content-type", "")
            if wtype == "response" and rec_ct.startswith("application/http"):
                status, ctype, body = _parse_http_response(block)
                yield (fname, wtype, uri, wdate, status, ctype, body)
            else:
                yield (fname, wtype, uri, wdate, None, rec_ct or None, block)


class WarcDataSource(DataSource):
    """``spark.read.format("warc").option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> _WarcReader:
        return _WarcReader(self.options)


def register_warc_source(spark) -> None:
    spark.dataSource.register(WarcDataSource)


def write_warc_files_distributed(df, out_dir: str) -> None:
    """Materialize ``(file_key STRING, target_uri STRING, warc_date
    STRING, http_status INT, content_type STRING, body BINARY, seq
    BIGINT)`` as one ``<file_key>.warc`` per key WITHOUT funneling rows
    through the driver (the ``write_state_files_distributed``
    discipline): repartition by key routes each file's rows to one
    task; the within-partition sort on (key, seq) makes file bytes
    deterministic. Ingest-edge note: in production WARC files are the
    INPUT — this writer exists for fixtures and tests."""
    cols = [
        "file_key", "target_uri", "warc_date", "http_status",
        "content_type", "body", "seq",
    ]

    def write_partition(it) -> None:
        os.makedirs(out_dir, exist_ok=True)
        open_key, fh = None, None
        for row in it:
            if row.file_key != open_key:
                if fh is not None:
                    fh.close()
                open_key = row.file_key
                fh = open(os.path.join(out_dir, f"{open_key}.warc"), "wb")
                fh.write(
                    build_warc_record(
                        "warcinfo", None, row.warc_date, b"software: spark-graft\r\n"
                    )
                )
            fh.write(
                build_warc_record(
                    "response",
                    row.target_uri,
                    row.warc_date,
                    bytes(row.body),
                    http_status=int(row.http_status),
                    content_type=row.content_type,
                )
            )
        if fh is not None:
            fh.close()

    (
        df.toDF(*cols)
        .repartition("file_key")
        .sortWithinPartitions("file_key", "seq")
        .foreachPartition(write_partition)
    )


def warc_records_from_binary(files) -> "DataFrame":
    """WARC records from a ``binaryFile``-shaped frame (``path``,
    ``content``) — the STREAMING twin of the batch DataSource:
    ``spark.readStream.format("binaryFile")`` delivers each arriving
    ``.warc`` file exactly once, and this Arrow-batched ``mapInPandas``
    expands files into ``WARC_SCHEMA`` record rows executor-side, so
    record parsing inherits the file stream's exactly-once accounting.
    One Python hop per file batch (the multimodal slow-path discipline);
    a malformed file raises (ingest-edge truncation is a bad FILE — see
    module header), matching the batch reader's contract."""
    import pandas as pd

    cols = [
        "warc_file", "warc_type", "target_uri", "warc_date",
        "http_status", "content_type", "payload",
    ]

    def batches(it):
        for pdf in it:
            out: dict[str, list] = {k: [] for k in cols}
            for path, content in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(path)
                data = maybe_gunzip_warc(bytes(content), fname)
                for fields, block in parse_warc(data):
                    wtype = fields.get("warc-type", "")
                    rec_ct = fields.get("content-type", "")
                    if wtype == "response" and rec_ct.startswith("application/http"):
                        status, ctype, body = _parse_http_response(block)
                    else:
                        status, ctype, body = None, rec_ct or None, block
                    out["warc_file"].append(fname)
                    out["warc_type"].append(wtype)
                    out["target_uri"].append(fields.get("warc-target-uri"))
                    out["warc_date"].append(fields.get("warc-date"))
                    out["http_status"].append(status)
                    out["content_type"].append(ctype)
                    out["payload"].append(body)
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(batches, schema=WARC_SCHEMA)
