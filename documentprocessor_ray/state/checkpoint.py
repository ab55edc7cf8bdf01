"""Partitioned, resumable run driver with per-partition lineage + metrics.

Ray Data restarts a killed pipeline from scratch, so the checkpoint unit is
made explicit here (SURVEY.md §4.2): the input corpus is hash-partitioned on
doc_id (corpus.py writes ``documents/part={i}/``); each partition runs as its
own streaming job and commits

    output_dir/part={i}/*.parquet          (the result rows)
    output_dir/_manifest/part-{i}.json     (lineage + counters, atomic rename)

A resumed run lists manifests first and SKIPS every partition whose manifest
exists with a matching config hash — completed work is never recomputed, and
a partition is only considered complete after its manifest rename (writes
happen before the manifest, so a crash mid-partition re-runs just that
partition; output overwrite makes the retry idempotent).

The manifest replaces the reference's in-memory C# job dict
(Api/ServiceSideDocumentProcessor.cs:20,659-778) — progress/counters live in
durable per-partition records instead of mutable process state.

At cluster scale the partition loop becomes "submit one job per incomplete
partition"; partition count P is chosen so one partition's working set fits
a node's object store (P = total_bytes / (nodes * store_budget)).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Any, Dict, List, Optional

import pyarrow.compute as pc

import ray.data

from ..pipelines.extract import build_pipeline
from ..stages.preprocess import PreprocessConfig


def _config_hash(cfg: Optional[PreprocessConfig], batch_size: int,
                 model: Optional[str] = None,
                 target_blocks: Optional[int] = None) -> str:
    payload = json.dumps({
        "cfg": vars(cfg) if cfg else vars(PreprocessConfig()),
        "batch_size": batch_size,
        "model": model,
        "target_blocks": target_blocks,
    }, sort_keys=True, default=str)
    return hashlib.md5(payload.encode()).hexdigest()


def _manifest_path(output_dir: str, part: str) -> str:
    return os.path.join(output_dir, "_manifest", f"{part}.json")


def list_partitions(documents_dir: str) -> List[str]:
    return sorted(
        d for d in os.listdir(documents_dir)
        if d.startswith("part=") and os.path.isdir(os.path.join(documents_dir, d))
    )


def completed_partitions(output_dir: str, config_hash: str) -> List[str]:
    mdir = os.path.join(output_dir, "_manifest")
    if not os.path.isdir(mdir):
        return []
    done = []
    for f in sorted(os.listdir(mdir)):
        if not f.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, f)) as fh:
                m = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue  # torn manifest = incomplete partition
        if m.get("config_hash") == config_hash:
            done.append(m["partition"])
    return done


def run_partitioned(
    documents_dir: str,
    media_dir: str,
    output_dir: str,
    cfg: Optional[PreprocessConfig] = None,
    batch_size: int = 64,
    max_partitions: Optional[int] = None,
    model: Optional[str] = None,
    use_actors: bool = False,
    target_blocks: Optional[int] = None,
    debug_dir: Optional[str] = None,
    engine=None,
    html_mode: str = "blocks",
) -> Dict[str, Any]:
    """Run (or resume) the extraction over all input partitions.

    ``max_partitions`` limits how many incomplete partitions this invocation
    processes (used by the kill-and-resume test to simulate a dying run).
    ``model`` appends the scorer actor-pool stage (stages/scorer.py) to each
    partition's pipeline; the remaining knobs thread straight to
    build_pipeline so the CLI surface is not silently dropped.
    Returns a summary with per-partition status + aggregate counters.
    """
    chash = _config_hash(cfg, batch_size, model=model,
                         target_blocks=target_blocks)
    parts = list_partitions(documents_dir)
    done = set(completed_partitions(output_dir, chash))
    summary: Dict[str, Any] = {"config_hash": chash, "partitions": {}, "skipped": sorted(done)}
    processed = 0

    for part in parts:
        if part in done:
            summary["partitions"][part] = "skipped"
            continue
        if max_partitions is not None and processed >= max_partitions:
            summary["partitions"][part] = "deferred"
            continue
        t0 = time.time()
        part_out_pre = os.path.join(output_dir, part)
        if os.path.isdir(part_out_pre):
            # no manifest VALID FOR THIS CONFIG -> any existing output is a
            # torn previous attempt (or a different-config run). Remove the
            # partition's manifest FIRST — whatever config hash it carries —
            # so a stale manifest can never outlive deleted data: if this
            # run crashes between rmtree and its own manifest commit, a
            # later resume under the OLD config must re-run the partition,
            # not skip it as complete (silent data loss otherwise).
            # Delete-then-rewrite makes the retry idempotent; the manifest
            # rename stays the single commit point.
            import shutil

            stale_manifest = _manifest_path(output_dir, part)
            if os.path.exists(stale_manifest):
                os.remove(stale_manifest)
            shutil.rmtree(part_out_pre)
        in_path = os.path.join(documents_dir, part)
        raw = ray.data.read_parquet(in_path)
        n_docs = raw.count()  # metadata-only on a fresh read
        docs = raw.select_columns(["doc_id", "spans"])
        ds = build_pipeline(docs, media_dir, cfg=cfg, batch_size=batch_size,
                            html_mode=html_mode,
                            size_hint=n_docs, use_actors=use_actors,
                            target_blocks=target_blocks, debug_dir=debug_dir,
                            engine=engine, keep_words=model is not None)
        if model is not None:
            from ..stages.scorer import ScorerStage

            ds = ds.map_batches(
                ScorerStage, fn_constructor_kwargs={"model": model},
                batch_format="pyarrow", batch_size=batch_size,
                concurrency=(1, 4), num_cpus=1)

        part_out = os.path.join(output_dir, part)
        os.makedirs(part_out, exist_ok=True)
        # DISTRIBUTED writers: the partition's result blocks are pinned once
        # (materialize — the checkpoint unit is sized to fit the cluster's
        # object store), written by Ray Data's parallel parquet writers
        # (driver bandwidth is no longer the sink bottleneck), and the
        # counters come from a tiny follow-up aggregate over the same
        # blocks: one (1-row-per-block) partial table collected to the
        # driver. The manifest rename below stays the atomic commit point.
        mat = ds.materialize()
        mat.write_parquet(part_out)

        def _count_partial(b):
            import pyarrow as pa
            ok = pc.sum(pc.cast(pc.equal(b["status"], "done"), "int64")).as_py() or 0
            return pa.table({
                "docs_in": pa.array([b.num_rows], pa.int64()),
                "docs_ok": pa.array([int(ok)], pa.int64()),
                "words": pa.array([int(pc.sum(b["n_words"]).as_py() or 0)], pa.int64()),
                "spans_out": pa.array(
                    [int(pc.sum(pc.list_value_length(b["spans_out"])).as_py() or 0)],
                    pa.int64()),
            })

        counters = {"docs_in": 0, "docs_ok": 0, "words": 0, "spans_out": 0}
        for r in mat.map_batches(_count_partial,
                                 batch_format="pyarrow").take_all():
            for k in counters:
                counters[k] += int(r[k])
        counters["docs_failed"] = counters["docs_in"] - counters["docs_ok"]

        manifest = {
            "partition": part,
            "config_hash": chash,
            "lineage": {
                "input_dir": in_path,
                "input_files": sorted(os.listdir(in_path)),
                "media_dir": media_dir,
            },
            "counters": counters,
            "wall_ms": int((time.time() - t0) * 1000),
            "committed_at": time.time(),
        }
        mpath = _manifest_path(output_dir, part)
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2)
        os.replace(tmp, mpath)  # atomic commit point
        summary["partitions"][part] = "done"
        processed += 1

    return summary
