"""WARC record source — the web-crawl ingestion format a 100-TB corpus
actually arrives in (ISO 28500 WARC/1.0; cf. Common Crawl's WARC layout).

Two halves:

* ``write_warc_shards`` synthesizes deterministic WARC shards from a
  ``documents``-shaped parquet table (test/bench scaffolding — at production
  scale the shards already exist on object storage). One shard per
  ``doc_id % num_shards``, records in ascending doc_id order, so the byte
  stream is a pure function of the input table.

* ``read_warc`` ingests a shard directory as a Ray Dataset:
  ``read_binary_files`` (each shard = one block, shards are the natural
  parallelism unit exactly as in a real crawl bucket) -> a ``map_batches``
  parser that walks records by ``Content-Length`` — NOT by splitting on
  blank lines, because an HTTP payload may legally contain ``\r\n\r\n``.
  Output rows: (record_id, warc_type, target_uri, payload: binary).

Scale notes: parsing is per-file sequential (records are length-prefixed so
this is inherent) but files are the parallel grain; payload bytes stay in
Arrow binary columns end to end (no Python str until a consumer decodes).
The round-trip is hash-gated by the ``warc_ingest`` query: payload bytes
re-derived from documents.parquet must md5-match in DuckDB.
"""

from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

_CRLF = b"\r\n"


def _record_bytes(doc_id: int, source: str, payload: bytes) -> bytes:
    """One WARC/1.0 response record. Header order is fixed so shard bytes
    are deterministic."""
    uri = f"https://example.org/{source}/{doc_id}"
    header = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: response\r\n".encode()
        + f"WARC-Record-ID: <urn:doc:{doc_id:08d}>\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
    )
    return header + _CRLF + payload + _CRLF + _CRLF


def write_warc_shards(documents_parquet: str, out_dir: str,
                      num_shards: int = 8) -> str:
    """Deterministic WARC shards from a documents table (idempotent via a
    _COMPLETE marker; the marker is ignored — and shards regenerated — when
    the source parquet is newer than it, so a regenerated table at the same
    path never serves stale shard bytes). Shard k holds
    doc_id % num_shards == k in ascending doc_id order."""
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker) and \
            os.stat(marker).st_mtime_ns >= os.stat(documents_parquet).st_mtime_ns:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(documents_parquet,
                      columns=["doc_id", "text", "source"])
    t = t.sort_by("doc_id")
    doc_ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    sources = t["source"].to_pylist()
    shards: list[list[bytes]] = [[] for _ in range(num_shards)]
    for did, text, src in zip(doc_ids, texts, sources):
        shards[did % num_shards].append(
            _record_bytes(did, src, (text or "").encode("utf-8")))
    for k, recs in enumerate(shards):
        with open(os.path.join(out_dir, f"shard-{k:05d}.warc"), "wb") as f:
            f.write(b"".join(recs))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


_MAGIC = b"WARC/1.0\r\n"


def parse_warc_bytes(blob: bytes) -> dict:
    """Parse one WARC file's bytes into columnar record fields. Walks
    records via Content-Length (payloads may contain blank lines).

    Corruption policy (a crawl loader must not lose a whole shard tail to
    one bad record): a record whose header is malformed — no version
    magic, unparsable Content-Length, or a truncated header — is SKIPPED
    by resyncing to the next ``WARC/1.0`` magic, and ``n_skipped`` counts
    the resyncs. A record whose declared payload overruns the file is
    dropped as truncated."""
    rec_ids: list[str] = []
    types: list[str] = []
    uris: list[str] = []
    payloads: list[bytes] = []
    n_skipped = 0
    pos, n = 0, len(blob)

    def resync(p: int) -> int:
        nxt = blob.find(_MAGIC, p)
        return nxt if nxt >= 0 else n

    while pos < n:
        if not blob.startswith(_MAGIC, pos):
            n_skipped += 1
            pos = resync(pos + 1)
            continue
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            n_skipped += 1  # truncated header at EOF
            break
        header = blob[pos:head_end].decode("utf-8", errors="replace")
        fields = {}
        for line in header.split("\r\n")[1:]:  # [0] is the version line
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
            if clen < 0:
                raise ValueError
        except (KeyError, ValueError):
            n_skipped += 1
            pos = resync(pos + 1)
            continue
        body_start = head_end + 4
        if body_start + clen > n:
            n_skipped += 1  # declared payload overruns the file
            break
        rec_ids.append(fields.get("warc-record-id", ""))
        types.append(fields.get("warc-type", ""))
        uris.append(fields.get("warc-target-uri", ""))
        payloads.append(blob[body_start:body_start + clen])
        pos = body_start + clen + 4  # skip payload + record-final CRLFCRLF
    return {"record_id": rec_ids, "warc_type": types,
            "target_uri": uris, "payload": payloads,
            "n_skipped": n_skipped}


def read_warc(shard_dir: str, parallelism: Optional[int] = None,
              include_skips: bool = False) -> "ray.data.Dataset":
    """Shard files -> parsed record rows. One file per input block keeps the
    parse embarrassingly parallel; payload stays a binary column.

    Ingestion loss is observable: every record row carries
    ``n_skipped_in_file`` — the number of corrupt/truncated records the
    parser resynced past in that record's shard file — when
    ``include_skips=True``; a loader can aggregate it per file (see
    ``q_warc_skips``) instead of silently losing records. Default output
    schema is unchanged for existing consumers."""
    files = ray.data.read_binary_files(
        shard_dir, file_extensions=["warc"],
        **({"override_num_blocks": parallelism} if parallelism else {}))

    def parse(batch: pa.Table) -> pa.Table:
        cols = {"record_id": [], "warc_type": [], "target_uri": [],
                "payload": []}
        skips: list[int] = []
        for blob in batch["bytes"].to_pylist():
            one = parse_warc_bytes(blob)
            for k in cols:
                cols[k].extend(one[k])
            skips.extend([one["n_skipped"]] * len(one["record_id"]))
        out = {
            "record_id": pa.array(cols["record_id"], pa.string()),
            "warc_type": pa.array(cols["warc_type"], pa.string()),
            "target_uri": pa.array(cols["target_uri"], pa.string()),
            "payload": pa.array(cols["payload"], pa.binary()),
        }
        if include_skips:
            out["n_skipped_in_file"] = pa.array(skips, pa.int64())
        return pa.table(out)

    return files.map_batches(parse, batch_format="pyarrow")


def read_warc_file_audit(shard_dir: str,
                         parallelism: Optional[int] = None
                         ) -> "ray.data.Dataset":
    """Per-FILE ingestion audit: one row per shard file with the parsed
    record count and the number of corrupt/truncated records the parser
    resynced past — so ingestion loss is observable even for a file whose
    every record is corrupt (which contributes no record rows and would be
    invisible to a per-record column)."""
    files = ray.data.read_binary_files(
        shard_dir, file_extensions=["warc"], include_paths=True,
        **({"override_num_blocks": parallelism} if parallelism else {}))

    def audit(batch: pa.Table) -> pa.Table:
        names, nrec, nskip = [], [], []
        for path, blob in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            one = parse_warc_bytes(blob)
            names.append(os.path.basename(path))
            nrec.append(len(one["record_id"]))
            nskip.append(one["n_skipped"])
        return pa.table({
            "shard_file": pa.array(names, pa.string()),
            "n_records": pa.array(nrec, pa.int64()),
            "n_skipped": pa.array(nskip, pa.int64()),
        })

    return files.map_batches(audit, batch_format="pyarrow")
