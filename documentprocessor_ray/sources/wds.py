"""WebDataset-style tar-shard source — the de-facto container for
multimodal training corpora (LAION, DataComp, OBELICS distribute tar
shards whose members group by sample key: ``{key}.txt``, ``{key}.json``,
``{key}.jpg`` ...).

``read_wds`` makes shard FILES the parallel grain: ``ray.data
.read_binary_files`` yields one (path, bytes) row per shard, and a
``map_batches`` stage parses each tar in memory with stdlib ``tarfile``,
grouping members by sample key and emitting one Arrow row per sample.
At 100 TB the shard listing is the only driver-side metadata; shards are
sized (100 MB–1 GB) so one shard is one task and the object store never
holds more than the in-flight shards (streaming backpressure does the
rest). No random access into a tar is ever needed — WebDataset's whole
point is sequential-read locality.

``write_wds_shards`` exists for the sandbox gate: it derives a
deterministic tar corpus from the documents table (shard k holds
doc_id % num_shards == k in ascending doc_id order; each sample is a
``{doc_id:012d}.txt`` member with the utf-8 text and a
``{doc_id:012d}.json`` member with the metadata record; all tar headers
are zeroed — mtime=0, uid/gid=0, POSIX format — so shard bytes are
bit-reproducible). The paired query's DuckDB twin re-derives the same
aggregate logically from the parquet view, so the hash gate verifies the
tar encode + parse round trip, not a pass-through. Idempotent via a
_COMPLETE marker invalidated when the source parquet is newer (same
staleness discipline as sources/warc.py).

Reference surface: the reference engine loads one document image per
file path (Ocr/src/cli/utils.py); this source is the corpus-scale
analog where millions of small samples must not become millions of
small files.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from typing import Dict, List

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

_META_COLS = ("doc_id", "source", "lang", "n_chars")


def _zeroed(info: tarfile.TarInfo) -> tarfile.TarInfo:
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    info.mode = 0o644
    return info


def write_wds_shards(documents_parquet: str, out_dir: str,
                     num_shards: int = 8) -> str:
    """Deterministic WebDataset tar shards from a documents table."""
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker) and \
            os.stat(marker).st_mtime_ns >= \
            os.stat(documents_parquet).st_mtime_ns:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(documents_parquet,
                      columns=list(_META_COLS) + ["text"]).sort_by("doc_id")
    rows = t.to_pylist()
    writers: List[tarfile.TarFile] = []
    bufs: List[io.BytesIO] = []
    for _ in range(num_shards):
        b = io.BytesIO()
        bufs.append(b)
        writers.append(tarfile.open(fileobj=b, mode="w",
                                    format=tarfile.USTAR_FORMAT))
    for r in rows:
        k = int(r["doc_id"]) % num_shards
        key = f"{int(r['doc_id']):012d}"
        txt = (r["text"] or "").encode("utf-8")
        meta = json.dumps({c: r[c] for c in _META_COLS},
                          separators=(",", ":")).encode("utf-8")
        for name, payload in ((f"{key}.txt", txt), (f"{key}.json", meta)):
            info = _zeroed(tarfile.TarInfo(name=name))
            info.size = len(payload)
            writers[k].addfile(info, io.BytesIO(payload))
    for k, (w, b) in enumerate(zip(writers, bufs)):
        w.close()
        with open(os.path.join(out_dir, f"shard-{k:05d}.tar"), "wb") as f:
            f.write(b.getvalue())
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def parse_wds_bytes(blob: bytes) -> Dict[str, list]:
    """Parse one tar shard into columnar sample lists (pure, testable).

    Members group by basename-without-extension; a sample row is emitted
    once its ``.txt`` and ``.json`` members are both seen. Unknown
    extensions are carried as opaque binary payloads would be in a real
    multimodal shard — here they are counted so ingestion loss is
    observable (same observability rule as warc.n_skipped).
    """
    out: Dict[str, list] = {"doc_id": [], "source": [], "lang": [],
                            "n_chars": [], "text": [], "n_extra_members": []}
    texts: Dict[str, str] = {}
    metas: Dict[str, dict] = {}
    n_extra = 0
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r") as tf:
        for m in tf:
            if not m.isfile():
                continue
            base, dot, ext = m.name.rpartition(".")
            payload = tf.extractfile(m).read()
            if ext == "txt":
                texts[base] = payload.decode("utf-8")
            elif ext == "json":
                metas[base] = json.loads(payload.decode("utf-8"))
            else:
                n_extra += 1
    for key in sorted(texts.keys() & metas.keys()):
        meta = metas[key]
        out["doc_id"].append(int(meta["doc_id"]))
        out["source"].append(meta["source"])
        out["lang"].append(meta["lang"])
        out["n_chars"].append(int(meta["n_chars"]))
        out["text"].append(texts[key])
        out["n_extra_members"].append(n_extra)
    return out


def read_wds(shard_dir: str) -> "ray.data.Dataset":
    """Read a directory of .tar shards; one parse task per shard file."""
    paths = sorted(
        os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
        if f.endswith(".tar"))
    raw = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        cols: Dict[str, list] = {"doc_id": [], "source": [], "lang": [],
                                 "n_chars": [], "text": [],
                                 "n_extra_members": []}
        for blob in batch["bytes"]:
            one = parse_wds_bytes(blob.as_py())
            for c in cols:
                cols[c].extend(one[c])
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "source": pa.array(cols["source"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
            "n_chars": pa.array(cols["n_chars"], pa.int64()),
            "text": pa.array(cols["text"], pa.string()),
            "n_extra_members": pa.array(cols["n_extra_members"],
                                        pa.int64())})

    return raw.map_batches(parse, batch_format="pyarrow")
