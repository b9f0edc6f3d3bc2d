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
  driver funnel. Real crawls shard into many ~1 GB WARC files
  (CommonCrawl ships ~64,000 per snapshot), so per-file parallelism is
  the natural unit; record-level splitting inside one file would need a
  synchronizing scan anyway (records are length-delimited, not
  offset-indexed).
- **O(record) executor memory, never O(file)** (r13, VERDICT item 1):
  the reader walks the file as a STREAM — gzip members are inflated
  incrementally (``gzip.GzipFile`` consumes concatenated members from
  the file object), and the parse buffers exactly one record (header
  block + ``Content-Length`` body) before yielding it. At CommonCrawl
  sizes (~1 GB ``.warc.gz`` inflating 4-5×) the r12 whole-file form
  peaked at ~10 GB per task — compressed + decompressed both resident —
  which OOMs at 16-32 concurrent tasks/executor; the stream form peaks
  at max-record-size + one I/O chunk regardless of file size
  (peak-buffer pytest pinned in tests/test_sources.py).
- **filesystem-agnostic discovery and reads** (r13, VERDICT item 5):
  paths resolve through ``pyarrow.fs`` — a bare path is the local FS, a
  scheme-prefixed URI (``file://``, ``s3://``, ``hdfs://``) resolves via
  ``FileSystem.from_uri`` — so the ingest edge reads the same paths
  Spark can. ``pyarrow.fs`` works identically in the driver-side
  planning worker and the executors (no JVM gateway needed, which
  Python DataSource workers don't have).
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

import io
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

WARC_SCHEMA = (
    "warc_file STRING, warc_type STRING, target_uri STRING, warc_date STRING, "
    "http_status INT, content_type STRING, payload BINARY"
)

_CRLF2 = b"\r\n\r\n"

#: Stream read granularity. Big enough that per-chunk Python overhead is
#: negligible against 1 MB+ record bodies, small enough that it, not the
#: chunk, never dominates the peak-memory bound.
_CHUNK = 1 << 20


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


class _PrependReader(io.RawIOBase):
    """A read-only stream that serves ``head`` bytes first, then reads
    from ``tail`` — how the magic-sniffed prefix is handed back to the
    stream without requiring ``tail`` to be seekable (pyarrow input
    streams over object stores are not)."""

    def __init__(self, head: bytes, tail):
        self._head = head
        self._tail = tail

    def readable(self) -> bool:  # pragma: no cover - io protocol slot
        return True

    def readinto(self, b) -> int:
        if self._head:
            n = min(len(b), len(self._head))
            b[:n] = self._head[:n]
            self._head = self._head[n:]
            return n
        data = self._tail.read(len(b))
        if not data:
            return 0
        b[: len(data)] = data
        return len(data)


def iter_warc_records(reader) -> Iterator[tuple[dict, bytes]]:
    """Walk a (plain) WARC byte STREAM record by record: yields
    ``(lowercased header fields, content block)`` while holding at most
    one record plus one I/O chunk in memory. Length-delimited — the
    block is consumed by ``Content-Length``, never scanned. Raises
    ``ValueError`` on a bad version line, a missing length, or a
    truncated block. ``reader`` needs only ``.read(n)``."""
    buf = bytearray()
    pos = 0  # consumed prefix — advanced instead of deleting from the
    # front (a per-record del buf[:n] memmoves the tail and goes
    # quadratic on small-record files); the prefix is dropped once per
    # FILL, when the unconsumed remainder is at its smallest
    eof = False

    def fill() -> bool:
        nonlocal eof, pos
        if eof:
            return False
        chunk = reader.read(_CHUNK)
        if not chunk:
            eof = True
            return False
        if pos:
            del buf[:pos]
            pos = 0
        buf.extend(chunk)
        return True

    while True:
        # inter-record separators (the record terminator CRLFCRLF tail)
        while True:
            while len(buf) - pos < 2 and fill():
                pass
            if buf[pos : pos + 2] == b"\r\n":
                pos += 2
            else:
                break
        if pos >= len(buf):
            return
        # header block: everything up to the first CRLFCRLF
        search_from = pos
        while True:
            idx = buf.find(_CRLF2, search_from)
            if idx >= 0:
                break
            # scanned through len(buf) - 3; resume there after the fill,
            # rebased by the `dropped` bytes fill()'s compaction removes
            scanned_to = max(pos, len(buf) - (len(_CRLF2) - 1))
            dropped = pos
            if not fill():
                raise ValueError("truncated WARC header block")
            search_from = scanned_to - dropped
        lines = bytes(buf[pos:idx]).decode("latin-1").split("\r\n")
        pos = idx + len(_CRLF2)
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
        while len(buf) - pos < clen:
            if not fill():
                raise ValueError("truncated WARC content block")
        block = bytes(buf[pos : pos + clen])
        pos += clen
        yield fields, block


def open_warc_record_stream(raw, fname: str) -> Iterator[tuple[dict, bytes]]:
    """Record iterator over an open binary stream, with transparent
    ``.warc.gz`` member decode: sniff the gzip magic from the first two
    bytes (a mis-named plain file passes through; a ``.gz``-named file
    without the magic raises), then chain ``gzip.GzipFile`` — which
    consumes CommonCrawl's concatenated per-record members incrementally
    from the stream — into ``iter_warc_records``. Peak memory stays
    O(record): nothing here materializes the file or its inflation."""
    import gzip

    head = raw.read(2) or b""
    if head[:2] == b"\x1f\x8b":
        stream = gzip.GzipFile(
            fileobj=io.BufferedReader(_PrependReader(head, raw), _CHUNK)
        )
    elif fname.endswith(".gz"):
        raise ValueError(f"{fname}: .gz extension without gzip magic")
    else:
        stream = io.BufferedReader(_PrependReader(head, raw), _CHUNK)
    return iter_warc_records(stream)


def parse_warc(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Walk an in-memory WARC byte string record by record — the bytes
    façade over ``iter_warc_records`` (kept for fixtures and tests; the
    DataSource itself streams and never builds ``data``)."""
    return iter_warc_records(io.BytesIO(data))


def maybe_gunzip_warc(data: bytes, fname: str) -> bytes:
    """Transparent ``.warc.gz`` support over in-memory bytes: CommonCrawl
    ships WARC as a CONCATENATION of per-record gzip members (so HTTP
    range reads can fetch one record), which ``gzip`` decompresses in one
    pass back to the plain WARC stream. Bytes-in/bytes-out — callers that
    can hold the inflation should prefer ``open_warc_record_stream``,
    which never materializes it; this survives for byte-level tests."""
    if data[:2] == b"\x1f\x8b" or fname.endswith(".gz"):
        if data[:2] != b"\x1f\x8b":
            raise ValueError(f"{fname}: .gz extension without gzip magic")
        import gzip

        out = []
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
            while True:
                chunk = gz.read(_CHUNK)
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


def _record_row(fname: str, fields: dict, block: bytes) -> tuple:
    """One output row under ``WARC_SCHEMA`` — shared by the batch
    DataSource and the binaryFile streaming twin so the two fronts can
    never drift on the HTTP-unwrap rule."""
    wtype = fields.get("warc-type", "")
    rec_ct = fields.get("content-type", "")
    if wtype == "response" and rec_ct.startswith("application/http"):
        status, ctype, body = _parse_http_response(block)
    else:
        status, ctype, body = None, rec_ct or None, block
    return (
        fname,
        wtype,
        fields.get("warc-target-uri"),
        fields.get("warc-date"),
        status,
        ctype,
        body,
    )


def _filesystem_for(path: str):
    """(pyarrow filesystem, fs-native path) for a bare local path or a
    scheme-prefixed URI — the discovery/read resolver shared by planning
    (driver-side Python worker) and ``read`` (executors), neither of
    which has a JVM gateway; ``pyarrow.fs`` speaks local/S3/HDFS/GCS
    natively (the ``streaming.ann`` remote-FS posture, minus the py4j
    dependency that isn't available here)."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


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
        from pyarrow import fs as pafs

        filesystem, base = _filesystem_for(self._dir)
        infos = filesystem.get_file_info(pafs.FileSelector(base, recursive=False))
        # partitions carry FS-NATIVE paths; read() re-resolves the
        # filesystem from the original option, so authority components
        # (hdfs://namenode:8020/...) survive — a scheme+path reassembly
        # would drop them
        return [
            _WarcPartition(info.path)
            for info in sorted(infos, key=lambda i: i.path)
            if info.type == pafs.FileType.File
            and info.path.endswith((".warc", ".warc.gz"))
        ]

    def read(self, partition: _WarcPartition) -> Iterator[tuple]:
        fname = os.path.basename(partition.path)
        filesystem, _ = _filesystem_for(self._dir)
        # compression=None: pyarrow otherwise auto-inflates by extension,
        # and its codec layer is not contract-tested on CommonCrawl's
        # CONCATENATED gzip members — the member walk stays ours.
        with filesystem.open_input_stream(partition.path, compression=None) as raw:
            for fields, block in open_warc_record_stream(raw, fname):
                yield _record_row(fname, fields, block)


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
    module header), matching the batch reader's contract.

    Memory posture: the ``content`` CELL is O(file) by construction —
    Spark's binaryFile source materializes each file as one ≤ 2 GiB
    binary value — but decode adds only O(record) on top of it: records
    stream out of ``open_warc_record_stream`` over the cell, so the
    gzip INFLATION (4-5× at CommonCrawl ratios) is never resident. Files
    near or past the 2 GiB cell ceiling belong on the batch DataSource
    path, which never loads the file at all."""
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
                stream = open_warc_record_stream(io.BytesIO(bytes(content)), fname)
                for fields, block in stream:
                    row = _record_row(fname, fields, block)
                    for k, v in zip(cols, row):
                        out[k].append(v)
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(batches, schema=WARC_SCHEMA)
