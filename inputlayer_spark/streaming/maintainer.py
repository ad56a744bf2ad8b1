"""Incremental view maintenance over Structured Streaming.

What "streaming" means in the reference is incremental maintenance of
derived relations, not event-time windowing: every write is a timestamped
±1 delta pushed to a differential-dataflow worker that keeps derived
relations current (`/root/reference/src/incremental.rs:10-56`,
`docs/internals/architecture.md:199-296`). The Spark-native counterpart:

- the base relation's write stream is a Structured Streaming source
  (files appearing in a directory — the WAL-segment analog; in
  production a Kafka/Delta-CDF source plugs into the same seam),
- `foreachBatch` is the commit point: each micro-batch is appended to
  the engine relation and the dependency DAG invalidates exactly the
  derived relations that can observe the change (cascade invalidation,
  reference src/derived_relations.rs),
- re-materialization happens on the next query (lazy, like the
  reference's materialize-on-read for session rules) or eagerly via
  `refresh=True` for persistent rules (the reference's
  auto-rematerialization path).

Retraction fidelity note (SURVEY.md §2.8): deletes arriving as deltas
recompute affected views from the new snapshot — correct by
construction; we do not replicate DD's per-path multiplicity counting.

Scale: one micro-batch = one Spark job over only the new files; the
derived-relation recompute is a normal Catalyst plan over base tables,
so 100 TB behavior is governed by the same partitioning/pushdown story
as batch queries. Checkpointing makes the stream restartable
(exactly-once file-source semantics).
"""

from __future__ import annotations

import threading
from typing import List, Optional

from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------- fs helpers
#
# All StreamingCorpusDeduper state probes go through Hadoop's FileSystem
# API, not os.* (ADVICE r11): the state dirs are plain paths handed to
# spark.read/write, so they may live on HDFS/S3A/ABFS where os.listdir
# and open() silently see nothing. The JVM FileSystem resolves the
# scheme per-path, so local-fs tests and object-store production use
# the same code.


def _fs_for(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _fs_exists(spark, path: str) -> bool:
    fs, hpath, _ = _fs_for(spark, path)
    return bool(fs.exists(hpath))


def _fs_list_names(spark, path: str) -> List[str]:
    """Child names of a directory ([] if missing)."""
    fs, hpath, _ = _fs_for(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def _fs_read_text(spark, path: str) -> Optional[str]:
    fs, hpath, _ = _fs_for(spark, path)
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        out = bytearray()
        while True:
            b = stream.read()
            if b < 0:
                break
            out.append(b)
        return out.decode("utf-8")
    finally:
        stream.close()


def _fs_write_text(spark, path: str, text: str) -> None:
    """Write-temp-then-rename so readers never observe a torn marker
    (atomic on HDFS/local; S3A rename is copy+delete but still yields
    only whole objects)."""
    fs, hpath, jvm = _fs_for(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()
    if fs.exists(hpath):
        fs.delete(hpath, False)
    fs.rename(tmp, hpath)


def _fs_delete(spark, path: str) -> None:
    fs, hpath, _ = _fs_for(spark, path)
    if fs.exists(hpath):
        fs.delete(hpath, True)


class IncrementalMaintainer:
    """Maintains one base relation (and everything derived from it) from
    a directory-backed stream of parquet fact batches."""

    def __init__(
        self,
        engine,
        relation: str,
        source_dir: str,
        schema: T.StructType,
        checkpoint_dir: str,
        refresh: bool = True,
    ):
        self.engine = engine
        self.relation = relation
        self.source_dir = source_dir
        self.schema = schema
        self.checkpoint_dir = checkpoint_dir
        self.refresh = refresh
        self.batches_seen = 0
        self.delta_merges = 0  # views maintained by O(delta) merge
        self.full_recomputes = 0  # views invalidated for full recompute
        self._query = None
        self._lock = threading.Lock()

    # -------------------------------------------------------------- batch

    def _on_batch(self, batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        with self._lock:
            eng = self.engine
            rel = self.relation
            # append = the reference's (tuple, time, +1) delta stream;
            # collect into the driver-held relation plan. The batch is
            # tiny relative to the base (micro-batch), and checkpointing
            # keeps the union lineage flat.
            current = eng.current.relations.get(rel)
            merged = batch_df if current is None else current.unionByName(batch_df)
            eng.current.relations[rel] = merged.localCheckpoint(eager=True)
            # O(delta) paths first (engine._insert_maintain — the same
            # protocol literal fact inserts use): qualifying aggregate
            # views merge the micro-batch (try_delta_merge, reference
            # differential update BENCHMARKS.md:89-93), positive
            # recursive SCC fixpoints extend semi-naively from it
            # (recursion.seminaive_insert) — computed BEFORE invalidation
            # wipes their cache, re-seeded after.
            merged_views = {}
            if current is not None:
                merged_views = eng._insert_maintain(rel, batch_df, current)
            eng._invalidate(rel)
            # re-seed the cache with delta-merged views so the follow-up
            # materialization (and later queries) reuse them
            for h, v in merged_views.items():
                eng._cache_view(h, v)
            self.delta_merges += len(merged_views)
            if self.refresh:
                # auto-rematerialization of remaining invalidated rules
                # (reference derived_relations.rs cascade → recompute)
                self.full_recomputes += 1
                eng._materialize_for(None)
            self.batches_seen += 1

    # -------------------------------------------------------------- control

    def start(self, processing_interval: Optional[str] = None):
        """Begin maintenance. With processing_interval=None runs with
        availableNow (drain pending files, then stop) — the deterministic
        mode tests use; give e.g. '5 seconds' for continuous operation."""
        reader = (
            self.engine.spark.readStream.schema(self.schema)
            .format("parquet")
            .load(self.source_dir)
        )
        writer = reader.writeStream.foreachBatch(self._on_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if processing_interval is None:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_interval)
        # streaming micro-batches are an independent job source on the
        # shared SparkContext: register so a QueryServer watchdog on the
        # same session won't cancelAllJobs() out from under the stream.
        # Release any previous registration first — a restart without
        # stop() must not orphan a token (which would permanently
        # disable every watchdog on this context)
        from inputlayer_spark.session import (
            register_job_source,
            unregister_job_source,
        )

        if getattr(self, "_job_source", None) is not None:
            unregister_job_source(self.engine.spark, self._job_source)
        self._job_source = register_job_source(
            self.engine.spark, "incremental-maintainer"
        )
        try:
            self._query = writer.start()
        except Exception:
            unregister_job_source(self.engine.spark, self._job_source)
            self._job_source = None
            raise
        return self._query

    def process_available(self) -> None:
        """Drain all currently-available files and return (sync)."""
        q = self.start(processing_interval=None)
        try:
            q.awaitTermination()
        finally:
            self.stop()  # also unregisters the job source

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None
        if getattr(self, "_job_source", None) is not None:
            from inputlayer_spark.session import unregister_job_source

            unregister_job_source(self.engine.spark, self._job_source)
            self._job_source = None


class StreamingCorpusDeduper:
    """The production shape of `operators.dedup.incremental_dedup`
    (VERDICT r10 stretch #9): a readStream of NEW documents (the daily
    crawl) dedups every micro-batch against the persisted corpus, and
    survivors append to the corpus for the next batch to dedup against.

    All state lives ON DISK, so restart recovery is by construction:

    - `corpus_dir` — the existing corpus (parquet, read-only here),
    - `survivors_dir` — accepted batch rows, written one
      `batch=<id>` partition per micro-batch with mode("overwrite") so
      a foreachBatch RETRY after a crash rewrites the same partition
      instead of duplicating it (idempotent at-least-once → effective
      exactly-once),
    - `checkpoint_dir` — Structured Streaming's file-source ledger: a
      restarted instance skips already-committed input files.
    - `index_dir` — the persisted dedup index (md5 hashes, MinHash-LSH
      band rows, shingle arrays; `operators.dedup.build_dedup_index`),
      built ONCE from corpus_dir on first use, extended with one
      `batch=<id>` delta partition per accepted micro-batch.

    Per-batch cost is `incremental_dedup_indexed`'s: O(batch +
    candidates) — the corpus text is never re-read and its signatures
    never recomputed (the v1 formulation re-ran shingling + 64-way
    minhashing over the WHOLE corpus every micro-batch: O(corpus) per
    batch, unusable at 100 TB). All index deltas are written
    mode("overwrite") into their batch partition, so a foreachBatch
    retry is idempotent, exactly like the survivors themselves — AND
    the per-batch index read filters `batch < batch_id`, so a replay
    never dedups a batch against its own partially-committed deltas
    (ADVICE r11 HIGH).

    Index deltas accumulate one partition per accepted batch;
    `compact_index()` (or `auto_compact_every=N`) folds
    checkpoint-COMMITTED batches into a generational base so the
    per-batch read never degrades into a small-files scan. The
    SURVIVORS directory accumulates the same way but is user-facing
    contract (`corpus()` unions it, external readers scan it), so it is
    not folded in place — at daily-batch cadence rewrite it offline
    (read → repartition → write elsewhere → swap) during a stream stop,
    or point downstream consumers at periodic corpus() snapshots.
    """

    def __init__(
        self,
        spark,
        id_col: str,
        text_col: str,
        corpus_dir: str,
        source_dir: str,
        schema: T.StructType,
        checkpoint_dir: str,
        survivors_dir: str,
        index_dir: Optional[str] = None,
        num_perm: int = 64,
        bands: int = 16,
        shingle_n: int = 2,
        threshold: float = 0.5,
        auto_compact_every: Optional[int] = None,
        key_pushdown=False,
    ):
        self.spark = spark
        self.id_col = id_col
        self.text_col = text_col
        self.corpus_dir = corpus_dir
        self.source_dir = source_dir
        self.schema = schema
        self.checkpoint_dir = checkpoint_dir
        self.survivors_dir = survivors_dir
        self.index_dir = index_dir or survivors_dir.rstrip("/") + ".index"
        self.num_perm = num_perm
        self.bands = bands
        self.shingle_n = shingle_n
        self.threshold = threshold
        # fold index deltas into the base every N accepted batches
        # (None = manual compact_index() only). The operational loop
        # for long-lived streams: without it, thousands of daily
        # batches degrade the index read into a small-files scan.
        self.auto_compact_every = auto_compact_every
        # opt-in band-key parquet pushdown for TB-scale index artifacts
        # (see incremental_dedup_indexed's docstring for the measured
        # crossover; the base artifact is written key-range-clustered
        # precisely so this knob has row groups to skip)
        self.key_pushdown = key_pushdown
        self.batches_seen = 0
        self.compactions = 0
        self._query = None
        self._lock = threading.Lock()

    # -------------------------------------------------------------- state

    def corpus(self):
        """corpus_dir ∪ accepted survivors so far — the dedup reference
        for the next batch, and the user-facing deduplicated corpus."""
        cols = [self.id_col, self.text_col]
        base = self.spark.read.parquet(self.corpus_dir).select(*cols)
        if any(
            e.startswith("batch=")
            for e in _fs_list_names(self.spark, self.survivors_dir)
        ):
            surv = self.spark.read.parquet(self.survivors_dir).select(*cols)
            base = base.unionByName(surv)
        return base

    def snapshot_corpus(self, dest_dir: str, partitions: int = 32) -> int:
        """Write corpus() as a clean `partitions`-file parquet snapshot
        at `dest_dir` and return its row count — the operational answer
        to survivors-partition accumulation: downstream consumers read
        periodic snapshots instead of the ever-growing `batch=<id>`
        layout (which stays authoritative for the deduper itself; see
        the class docstring). Safe while the stream runs: corpus() is a
        read-only union and new survivors only ever append."""
        df = self.corpus().repartition(partitions)
        df.write.mode("overwrite").parquet(dest_dir)
        return self.spark.read.parquet(dest_dir).count()

    _INDEX_COLS = {
        "hashes": ("__id", "__h"),
        "bands": ("__id", "band", "key"),
        "arrays": ("__id", "__sh_arr"),
    }

    def _generation(self) -> int:
        """Current index generation. Generation 0 lives at the legacy
        layout `{index_dir}/{part}/batch=*`; `compact_index` writes each
        successor under `{index_dir}/g<N>/` and flips the `_GEN` pointer
        file last, so the switch is a single atomic rename.

        Recovery fallbacks, in order: the flip's delete-then-rename has
        a window where `_GEN` is briefly absent but `_GEN.tmp` (always
        fully written first) holds the new value — read it. If neither
        marker exists but `g<N>` dirs do (marker manually deleted), the
        highest complete generation on disk is authoritative: data dirs
        are only ever deleted AFTER a successful flip, so the max g<N>
        present is a committed generation."""
        txt = _fs_read_text(self.spark, f"{self.index_dir}/_GEN")
        if not txt:
            txt = _fs_read_text(self.spark, f"{self.index_dir}/_GEN.tmp")
        if txt:
            return int(txt.strip())
        gens = [
            int(name[1:])
            for name in _fs_list_names(self.spark, self.index_dir)
            if name.startswith("g") and name[1:].isdigit()
        ]
        return max(gens) if gens else 0

    def _part_root(self, part: str, gen: Optional[int] = None) -> str:
        g = self._generation() if gen is None else gen
        if g == 0:
            return f"{self.index_dir}/{part}"
        return f"{self.index_dir}/g{g}/{part}"

    def _index_part(self, part: str, before_batch: Optional[int] = None):
        """base (batch=-1) ∪ batch deltas of one index artifact.

        `before_batch` keeps only partitions with batch < that id —
        _on_batch passes the CURRENT batch id so a foreachBatch RETRY
        (crash between the delta writes and the streaming checkpoint
        commit) never dedups the replayed batch against its own
        just-written hashes (ADVICE r11 HIGH: without the filter a
        replay saw every batch row as an exact self-duplicate and
        overwrote the survivors partition with an empty frame — silent
        permanent loss). The filter also excludes any partially-written
        delta partition a mid-write crash left behind, since that
        partition carries the replayed batch's own id. Compaction
        preserves the invariant: it folds only batches the streaming
        checkpoint has COMMITTED into batch=-1, and a replayed batch is
        by definition uncommitted, so its rows can never hide in the
        folded base."""
        df = self.spark.read.parquet(self._part_root(part))
        if before_batch is not None:
            df = df.where(F.col("batch") < F.lit(before_batch))
        return df.select(*self._INDEX_COLS[part])

    def _ensure_index(self) -> None:
        """Build the base index from corpus_dir once (idempotent: the
        _BASE_DONE marker commits the build; a crash mid-build
        rebuilds)."""
        from inputlayer_spark.operators.dedup import build_dedup_index

        done = f"{self.index_dir}/_BASE_DONE"
        if _fs_exists(self.spark, done):
            return
        corpus = self.spark.read.parquet(self.corpus_dir).select(
            self.id_col, self.text_col
        )
        hashes, band_rows, arrays = build_dedup_index(
            corpus, self.id_col, self.text_col,
            self.num_perm, self.bands, self.shingle_n,
        )
        hashes.write.mode("overwrite").parquet(f"{self.index_dir}/hashes/batch=-1")
        # key-range-clustered layout so incremental_dedup_indexed's
        # per-batch `key IN (...)` pushdown skips whole row groups —
        # one create-time shuffle buys every future batch a pruned scan
        band_rows.repartitionByRange(F.col("key")).sortWithinPartitions(
            "key"
        ).write.mode("overwrite").parquet(f"{self.index_dir}/bands/batch=-1")
        arrays.write.mode("overwrite").parquet(f"{self.index_dir}/arrays/batch=-1")
        _fs_write_text(
            self.spark,
            done,
            f"num_perm={self.num_perm} bands={self.bands} "
            f"shingle_n={self.shingle_n}\n",
        )

    # -------------------------------------------------------------- batch

    def _on_batch(self, batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from inputlayer_spark.operators.dedup import incremental_dedup_indexed

        with self._lock:
            self._ensure_index()
            cols = [self.id_col, self.text_col]
            surv, d_hashes, d_bands, d_arrays = incremental_dedup_indexed(
                batch_df.select(*cols),
                self._index_part("hashes", before_batch=batch_id),
                self._index_part("bands", before_batch=batch_id),
                self._index_part("arrays", before_batch=batch_id),
                self.id_col,
                self.text_col,
                num_perm=self.num_perm,
                bands=self.bands,
                shingle_n=self.shingle_n,
                threshold=self.threshold,
                key_pushdown=self.key_pushdown,
            )
            surv.write.mode("overwrite").parquet(
                f"{self.survivors_dir}/batch={batch_id}"
            )
            gen = self._generation()
            for part, df in (
                ("hashes", d_hashes), ("bands", d_bands), ("arrays", d_arrays)
            ):
                df.write.mode("overwrite").parquet(
                    f"{self._part_root(part, gen)}/batch={batch_id}"
                )
            self.batches_seen += 1
            if (
                self.auto_compact_every
                and self.batches_seen % self.auto_compact_every == 0
            ):
                # the current batch is NOT yet in the commits ledger
                # (foreachBatch hasn't returned), so its partitions are
                # carried as deltas into the new generation, never
                # folded — a replay after a crash here still excludes
                # them via the batch < batch_id read filter
                if self._compact_locked() > 0:
                    self.compactions += 1

    # -------------------------------------------------------------- compact

    def _committed_batches(self) -> List[int]:
        """Batch ids the streaming checkpoint has COMMITTED — the
        `commits/` ledger Structured Streaming writes one integer-named
        file per finished micro-batch. Only these may be folded into the
        compacted base: a batch that wrote deltas but crashed before its
        commit will be REPLAYED, and its partial partition must stay
        batch-addressable so the replay's `batch < batch_id` filter can
        exclude it."""
        out = []
        for name in _fs_list_names(self.spark, f"{self.checkpoint_dir}/commits"):
            try:
                out.append(int(name))
            except ValueError:
                continue  # .tmp / metadata / compact ledger files
        return out

    def compact_index(self) -> int:
        """Fold committed `batch=<id>` index deltas into the base
        (VERDICT r11 #3: without compaction every accepted micro-batch
        adds three delta partitions FOREVER — after thousands of daily
        batches the per-batch index read degrades into a small-files
        scan and partition discovery dominates). Call between batches
        (it takes the same lock as _on_batch; safe while the stream is
        running — a concurrent micro-batch simply waits).

        Crash-atomic by generation, the engine `.compact` discipline:
        the folded artifacts are fully written under `g<N+1>/` (base
        `batch=-1` plus rewritten partitions for any UNcommitted batch
        ids, normally none), and only then does the `_GEN` pointer flip
        via write-temp-and-rename. A crash at any earlier point leaves
        the pointer on the old generation with every old partition
        intact; the orphaned half-written generation dir is ignored and
        overwritten by the next attempt. Returns the number of delta
        partitions folded (0 = nothing to do)."""
        with self._lock:
            return self._compact_locked()

    def _compact_locked(self) -> int:
        """compact_index body; caller holds self._lock (the auto-compact
        hook runs inside _on_batch's critical section)."""
        gen = self._generation()
        committed = set(self._committed_batches())
        new_gen = gen + 1
        plan = {}
        folded = 0
        for part in self._INDEX_COLS:
            root = self._part_root(part, gen)
            ids = []
            for name in _fs_list_names(self.spark, root):
                if name.startswith("batch="):
                    ids.append(int(name.split("=", 1)[1]))
            fold = [i for i in ids if i == -1 or i in committed]
            carry = [i for i in ids if i != -1 and i not in committed]
            plan[part] = (root, fold, carry)
            folded += max(len(fold) - 1, 0)
        if folded == 0:
            return 0
        # every part is rewritten into the new generation, even one
        # that happens to hold only its base — the pointer flip is
        # all-or-nothing across the three artifacts
        for part, (root, fold, carry) in plan.items():
            df = self.spark.read.parquet(root)
            cols = list(self._INDEX_COLS[part])
            dst = self._part_root(part, new_gen)
            base = df.where(F.col("batch").isin(fold)).select(*cols)
            if part == "bands":
                # restore the key-clustered layout the per-batch
                # pushdown prunes against (deltas arrive unsorted)
                base = base.repartitionByRange(
                    F.col("key")
                ).sortWithinPartitions("key")
            base.write.mode("overwrite").parquet(f"{dst}/batch=-1")
            for i in carry:
                df.where(F.col("batch") == i).select(*cols).write.mode(
                    "overwrite"
                ).parquet(f"{dst}/batch={i}")
        _fs_write_text(self.spark, f"{self.index_dir}/_GEN", str(new_gen))
        # best-effort cleanup of the superseded generation (crash
        # here costs disk, never correctness)
        for part in self._INDEX_COLS:
            _fs_delete(self.spark, self._part_root(part, gen))
        if gen > 0:
            _fs_delete(self.spark, f"{self.index_dir}/g{gen}")
        return folded

    # -------------------------------------------------------------- control

    def start(self, processing_interval: Optional[str] = None):
        reader = (
            self.spark.readStream.schema(self.schema)
            .format("parquet")
            .load(self.source_dir)
        )
        writer = reader.writeStream.foreachBatch(self._on_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if processing_interval is None:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_interval)
        from inputlayer_spark.session import (
            register_job_source,
            unregister_job_source,
        )

        if getattr(self, "_job_source", None) is not None:
            unregister_job_source(self.spark, self._job_source)
        self._job_source = register_job_source(self.spark, "streaming-deduper")
        try:
            self._query = writer.start()
        except Exception:
            unregister_job_source(self.spark, self._job_source)
            self._job_source = None
            raise
        return self._query

    def process_available(self) -> None:
        """Drain all currently-available batch files and return."""
        q = self.start(processing_interval=None)
        try:
            q.awaitTermination()
        finally:
            self.stop()

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None
        if getattr(self, "_job_source", None) is not None:
            from inputlayer_spark.session import unregister_job_source

            unregister_job_source(self.spark, self._job_source)
            self._job_source = None
