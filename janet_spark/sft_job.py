"""Production packaging of the SFT data build: transcripts in, a
committed training artifact out.

The oracle-checked queries prove each stage; this module is the JOB a
team actually schedules — the conversation training pipeline
(`conv_training_pipeline`: quality gate -> exact-dedup keeper semi-join ->
context-budget truncation -> fixed-512-token packing), the per-assistant-
turn loss-mask spans (`conv_loss_mask`), and the chat-template render
offsets (`chat_render`) written together as one atomically committed
generation:

    <output>/seqs/        one row per surviving conversation: its packed
                          sequence assignment (seq_id, seq_offset, tokens)
    <output>/loss_mask/   per-assistant-turn token spans inside the packs
    <output>/render/      per-turn chat-template fragments + char offsets
    <output>/_lineage/    one success row per committed generation

Commit protocol (same discipline as checkpoint.py / dedup_incremental.py,
mirroring the reference's temp-then-rename two-phase write,
apps/legacy/rename.ts:29-34): every table stages under
``_staging_<run_id>/`` and moves into place by atomic rename ONLY after
all three finished; the lineage row is appended last, so a crashed run
leaves either nothing visible or a complete generation. Resume mirrors
the reference's "PDF text already exists" idempotence guard
(apps/ocr/src/lib/ocr-utils.ts:376-378): a rerun that finds a success
lineage row for this output short-circuits without touching Spark —
pass ``force=True`` to rebuild.

Scale notes: all three tables come out of plans audited in PLANS.md —
the pipeline's narrow (conv_id, turn_idx, words) persist, conv_id-keyed
shuffles throughout, the two-level distributed prefix sum for packing,
and the render's single window pass. Nothing here adds a corpus pass:
the job is exactly the three registered queries plus file moves.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from janet_spark.checkpoint import new_run_id

_TABLES = ("seqs", "loss_mask", "render")


def _lineage_path(output_path: str) -> str:
    return os.path.join(output_path, "_lineage", "generations.jsonl")


def committed_generation(output_path: str) -> dict | None:
    """The latest success row, or None if no generation is committed."""
    path = _lineage_path(output_path)
    if not os.path.exists(path):
        return None
    last = None
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            if row.get("status") == "success":
                last = row
    return last


def run_sft_job(
    spark: SparkSession,
    transcripts: DataFrame,
    output_path: str,
    run_id: str | None = None,
    force: bool = False,
    fail_after_n_tables: int | None = None,
) -> dict:
    """Build and atomically commit the SFT training artifact. Returns a
    summary dict; ``resumed=True`` means a committed generation already
    existed and nothing ran."""
    from janet_spark.conversations import (
        conv_loss_mask_frame,
        conv_training_pipeline_frame,
    )
    from janet_spark.dialogue import chat_render_frame

    existing = committed_generation(output_path)
    if existing is not None and not force:
        return {
            "run_id": existing["run_id"],
            "resumed": True,
            "n_seqs": existing["n_seqs"],
            "n_mask_spans": existing["n_mask_spans"],
            "n_render_rows": existing["n_render_rows"],
        }

    run_id = run_id or new_run_id()
    staging = os.path.join(output_path, f"_staging_{run_id}")
    os.makedirs(staging, exist_ok=True)
    started = datetime.now(timezone.utc).isoformat()
    t0 = time.time()

    # scheme-agnostic DENSE pack ordinal: the job must accept ANY conv_id
    # scheme, so the pack order is a seeded-md5 permutation ranked through
    # the same 256-block + broadcast-prefix-sum helper as corpus_shuffle
    # (dense ranks keep the prefix-sum block table bounded; a raw hash
    # ordinal would make it corpus-sized). Seqs and loss_mask MUST share
    # one ordinal or spans would point into the wrong sequences.
    from pyspark.sql import functions as F

    from janet_spark.shard_writer import shuffle_ranked

    ordinal = shuffle_ranked(
        transcripts.select("conv_id").distinct(),
        seed="pack0",
        shard_size=1_000_000,
        key_col="conv_id",
    ).select("conv_id", F.col("shuffle_rank").alias("ord"))

    frames: dict[str, DataFrame] = {
        "seqs": conv_training_pipeline_frame(transcripts, ordinal=ordinal),
        "loss_mask": conv_loss_mask_frame(transcripts, ordinal=ordinal),
        "render": chat_render_frame(transcripts),
    }
    counts: dict[str, int] = {}
    for name, df in frames.items():
        path = os.path.join(staging, name)
        df.write.mode("overwrite").parquet(path)
        # metadata-only count over what was actually written
        counts[name] = spark.read.parquet(path).count()

    # all three staged -> move into place (atomic per-table rename), then
    # append the lineage row LAST so readers never see a partial
    # generation: a crash between moves leaves table dirs on disk but no
    # lineage row, committed_generation() stays at the previous
    # generation, and the next run rebuilds everything (fail_after_n_tables
    # injects exactly that crash for the pytest).
    for i, name in enumerate(_TABLES):
        if fail_after_n_tables is not None and i >= fail_after_n_tables:
            raise RuntimeError(f"injected failure after {i} table moves")
        dst = os.path.join(output_path, name)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.move(os.path.join(staging, name), dst)
    shutil.rmtree(staging, ignore_errors=True)

    row = {
        "run_id": run_id,
        "status": "success",
        "n_seqs": counts["seqs"],
        "n_mask_spans": counts["loss_mask"],
        "n_render_rows": counts["render"],
        "started_at": started,
        "finished_at": datetime.now(timezone.utc).isoformat(),
        "elapsed_sec": round(time.time() - t0, 2),
    }
    os.makedirs(os.path.dirname(_lineage_path(output_path)), exist_ok=True)
    with open(_lineage_path(output_path), "a") as f:
        f.write(json.dumps(row) + "\n")
    return {"run_id": run_id, "resumed": False, **{k: v for k, v in row.items() if k.startswith("n_")}}
