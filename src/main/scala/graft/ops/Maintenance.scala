package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance operators a production data pipeline runs daily:
  * MERGE-style upsert (SCD type 1), slowly-changing-dimension history
  * (SCD type 2), and changelog compaction (latest record per key).
  *
  * All three are declarative single-shuffle shapes:
  *  - upsert = anti-join + union — one shuffle on the merge key (or zero
  *    shuffles when the update set is broadcast-small, the common case for
  *    incremental loads);
  *  - scd2 = one window over (key, effective-order) — shuffles once on the
  *    key, then a per-partition sort;
  *  - latestPerKey = ranked window, same single-shuffle shape; at scale
  *    this beats groupBy + struct-max only when the full row is wide
  *    (no re-join needed).
  */
object Maintenance {

  /** MERGE-style upsert: rows of `updates` replace same-key rows of
    * `target`; update rows with unmatched keys are inserted. Matched-row
    * REPLACEMENT (not column patching) — the SCD1 contract.
    *
    * Shape: target anti-join update-keys (keeps unmatched target rows)
    * + union of the updates. The anti join shuffles on `keys`, or
    * broadcasts when the distinct update-key set is small — the normal
    * incremental-batch case; AQE picks that automatically.
    *
    * CONTRACT: `updates` must be key-unique (one row per `keys` value) —
    * SQL MERGE errors on multiple source matches; this passes every
    * update row through, breaking the target's key invariant. Compact a
    * multi-version CDC batch with [[latestPerKey]] first.
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val updKeys = updates.select(keys.map(col): _*).distinct()
    updates.unionByName(target.join(updKeys, keys, "left_anti"))
  }

  /** SCD type-2 history from a change log: each key's rows ordered by
    * `effective` (ties broken by `tieBreak`) become validity intervals —
    * `valid_from` = the row's effective value, `valid_to` = the next
    * row's (NULL on the open current row), `is_current` = 1 on the last
    * row per key. One window pass; no self-join.
    */
  def scd2(df: DataFrame, keys: Seq[String], effective: String,
           tieBreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((effective +: tieBreak).map(col): _*)
    val nxt = lead(col(effective), 1).over(w)
    df.withColumn("valid_from", col(effective))
      .withColumn("valid_to", nxt)
      .withColumn("is_current", nxt.isNull.cast("int"))
  }

  /** Changelog compaction: the latest row per key under `order` (pass
    * descending columns for "latest"). The CDC-merge read path: a raw
    * append log compacts to current state.
    */
  def latestPerKey(df: DataFrame, keys: Seq[org.apache.spark.sql.Column],
                   order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full CDC apply — [[upsert]] plus DELETE semantics: `changes` rows
    * carry `opCol` ∈ {I, U, D}; I/U rows replace same-key target rows
    * (SCD1, whole-row), D keys vanish. Same single-shuffle shape as
    * upsert: ONE anti-join on the full touched-key set (insert, update,
    * AND delete keys all remove the old row), then a union of the
    * non-delete change rows. Deletes cost nothing extra.
    *
    * CONTRACT (as upsert): `changes` must be key-unique — compact a raw
    * multi-version CDC batch with [[latestPerKey]] over (key, version)
    * FIRST, so "U then D" within one batch resolves to D before apply.
    *
    * The op domain is VALIDATED: a row whose op is NULL or outside
    * {I, U, D} fails the job (raise_error) rather than being silently
    * dropped — without the guard, `op =!= "D"` evaluates NULL for a NULL
    * op, so the anti-join would remove the touched key while the union
    * skipped its replacement row: a malformed CDC row deleting data
    * (ADVICE r5).
    */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
               opCol: String = "op"): DataFrame = {
    val checked = changes.withColumn(opCol,
      when(col(opCol).isin("I", "U", "D"), col(opCol))
        .otherwise(raise_error(concat(
          lit(s"applyCdc: invalid $opCol value: "),
          coalesce(col(opCol).cast("string"), lit("NULL"))))))
    val touched = checked.select(keys.map(col): _*).distinct()
    target.join(touched, keys, "left_anti")
      .unionByName(checked.filter(col(opCol) =!= "D").drop(opCol))
  }

  /** Zero-cost in-flight data-quality counters via the Observation API:
    * row count + per-column null counts ride along with whatever action
    * the caller already runs — NO second pass over the data (the naive
    * alternative, a separate agg job, re-reads the whole input; q22 is
    * that shape when a standalone profile IS the product). The returned
    * Observation yields its metrics map after the first action on the
    * returned frame — the hook a pipeline uses to fail a load whose null
    * rate jumped without paying for a validation scan at 100 TB.
    * Caveat (pinned in MaintenanceSpec): run it on a sort-free action —
    * a global orderBy samples the input for range boundaries first, and
    * the observe node counts that extra pass too.
    */
  def observedQuality(df: DataFrame, name: String, cols: Seq[String])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val metrics = count(lit(1)).as("n_rows") +:
      cols.map(c => sum(col(c).isNull.cast("long")).as(s"nulls_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Snapshot diff (the "data diff" a pipeline runs before promoting a
    * rebuilt table): row-level classification of snapshot `b` against
    * snapshot `a` by key — `added` / `removed` / `changed` / `unchanged`
    * — plus one `chg_<col>` flag per non-key column (null-safe compare,
    * so a NULL→value transition counts as a change; flags are only
    * meaningful on `changed` rows — an added/removed row trivially
    * differs everywhere). Schemas must match.
    *
    * One co-partitioned full-outer join on the keys — the only shape that
    * survives two 100 TB snapshots (bucket both snapshots by the key and
    * the join is shuffle-free); every flag is a codegen'd comparison.
    * Returns keys + status + the flags; callers aggregate for the
    * summary, or filter `status <> 'unchanged'` for the change feed.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(a.columns.toSeq == b.columns.toSeq,
      s"snapshotDiff: schemas differ: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val cmp = a.columns.toSeq.filterNot(keys.contains)
    val aT = a.withColumn("__in_a", lit(true))
    val bT = b.select(keys.map(col) ++
        cmp.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__in_b"): _*)
    val j = aT.join(bT, keys, "full_outer")
    val anyChg = cmp.map(c => !(col(c) <=> col(s"__b_$c")))
      .reduce(_ || _)
    val status = when(col("__in_a").isNull, "added")
      .when(col("__in_b").isNull, "removed")
      .when(anyChg, "changed")
      .otherwise("unchanged")
    j.select(keys.map(col) ++ Seq(status.as("status")) ++
      cmp.map(c => (!(col(c) <=> col(s"__b_$c"))).as(s"chg_$c")): _*)
  }

  /** One-scan table profiler — "DESCRIBE at scale": per column, row
    * count, null count, EXACT distinct count, and min/max (numeric
    * columns as doubles, string columns as strings).
    *
    * Shape: ONE scan unpivots every column into typed (col_name, v_num,
    * v_str) rows via `stack` (a map-side Generate), then a TWO-LEVEL
    * aggregate: groupBy(col_name, value) count → groupBy(col_name). The
    * first level combines map-side, so the shuffle carries one row per
    * DISTINCT value per column — not the row count, and not the Expand
    * row-multiplication that a single agg with k exact COUNT(DISTINCT)s
    * plans through (measured 24 s vs 3 s at sf0.1 for 10 lineitem
    * columns; Expand copies every row once per distinct aggregate).
    * Distinct counts, null counts, and typed min/max all derive from the
    * same value-grain rows. Numeric values profile through CAST AS
    * DOUBLE — injective below 2⁵³, callers with exotic decimals widen
    * the cast.
    */
  def tableProfile(df: DataFrame, numericCols: Seq[String],
                   stringCols: Seq[String]): DataFrame = {
    val arms = (numericCols.map { c =>
      s"'$c', CAST($c AS DOUBLE), CAST(NULL AS STRING)"
    } ++ stringCols.map { c =>
      s"'$c', CAST(NULL AS DOUBLE), CAST($c AS STRING)"
    }).mkString(", ")
    val k = numericCols.size + stringCols.size
    val isNull = col("v_num").isNull && col("v_str").isNull
    df.select(expr(s"stack($k, $arms) AS (col_name, v_num, v_str)"))
      .groupBy(col("col_name"), col("v_num"), col("v_str"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col("col_name"))
      .agg(sum(col("__cnt")).as("n_rows"),
        coalesce(sum(when(isNull, col("__cnt"))), lit(0L)).as("n_nulls"),
        count(when(!isNull, lit(1))).as("n_distinct"),
        min(col("v_num")).as("min_num"), max(col("v_num")).as("max_num"),
        min(col("v_str")).as("min_str"), max(col("v_str")).as("max_str"))
  }

  /** Change-data-feed GENERATION — [[snapshotDiff]]'s row-level output:
    * diff two snapshots into the Delta-CDF/Debezium changelog a consumer
    * replays — `+I` (insert, new values), `-D` (delete, old values), and
    * a `-U`/`+U` pair per changed key (old then new values). The exact
    * inverse of [[applyCdc]]: applying the emitted log to `a` rebuilds
    * `b`.
    *
    * Shape: ONE full-outer join on the keys, then unchanged rows filter
    * out and each surviving row EXPLODES into its 1-2 events (a when-
    * chained array of structs — map-side, fan-out ≤ 2). Never four
    * filtered re-executions of the join, which is what a UNION-of-legs
    * formulation plans.
    */
  def changelogDiff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(a.columns.toSeq == b.columns.toSeq,
      s"changelogDiff: schemas differ: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val cmp = a.columns.toSeq.filterNot(keys.contains)
    val aT = a.withColumn("__in_a", lit(true))
    val bT = b.select(keys.map(col) ++
        cmp.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__in_b"): _*)
    val j = aT.join(bT, keys, "full_outer")
    // foldLeft, not reduce: key-only snapshots (cmp empty) are legal —
    // anyChg degenerates to false, so matched keys are "unchanged" and
    // the log carries only +I/-D rows instead of throwing on the reduce
    val anyChg = cmp.map(c => !(col(c) <=> col(s"__b_$c")))
      .foldLeft(lit(false))(_ || _)
    def ev(op: String, f: String => Column) =
      struct(lit(op).as("op") +: cmp.map(c => f(c).as(c)): _*)
    val oldEv = (op: String) => ev(op, col)
    val newEv = (op: String) => ev(op, c => col(s"__b_$c"))
    j.filter(col("__in_a").isNull || col("__in_b").isNull || anyChg)
      .select(keys.map(col) :+ explode(
        when(col("__in_a").isNull, array(newEv("+I")))
          .when(col("__in_b").isNull, array(oldEv("-D")))
          .otherwise(array(oldEv("-U"), newEv("+U")))).as("__ev"): _*)
      .select(col("__ev.op").as("op") +: keys.map(col) ++:
        cmp.map(c => col(s"__ev.$c")): _*)
  }

  /** Compaction (OPTIMIZE) planner over a small-file inventory
    * (part, file_id, bytes): within each table partition, files are
    * packed size-descending into sequential bins of ~`targetBytes` via a
    * cumulative-sum window — bin = Σbytes-before DIV target, the same
    * greedy sequential packing Delta/Iceberg OPTIMIZE implementations
    * use (deterministic, one window, no bin-state loop). Returns one row
    * per planned rewrite task: (part, bin, n_files, total_bytes).
    *
    * Scale shape: the inventory is file METADATA (one row per file —
    * millions of rows for a petabyte table, not billions), the window
    * partitions by table-partition, and the plan is what an executor
    * fleet then executes; planning never touches data bytes.
    */
  def compactionPlan(files: DataFrame, targetBytes: Long): DataFrame = {
    val w = Window.partitionBy("part")
      .orderBy(col("bytes").desc, col("file_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("__before", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"__before DIV $targetBytes"))
      .groupBy(col("part"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("total_bytes"))
  }

  /** Join-key skew profile over (col_name, k) key instances: per audited
    * column, the distinct-key count, the hottest key and its count, the
    * max/mean skew ratio, and the Gini coefficient of the key-frequency
    * distribution — the pre-join diagnostic that decides between a plain
    * shuffle join, [[Skew.saltedJoin]], or AQE skew splitting BEFORE the
    * straggler task appears. All integer arithmetic until the two final
    * divisions: with counts c_i sorted ascending and 1-based rank i,
    * Gini = (2·Σi·c_i − (k+1)·n) / (k·n) — exact, merge-order-free.
    */
  def keySkewProfile(keyed: DataFrame): DataFrame = {
    // materialize the key-count table once: rankViaBuckets makes three
    // passes (edge sketch, bucket counts, final rank) and would otherwise
    // re-run the stack+count aggregate per pass (the decileLiftBucketed
    // checkpoint rationale); the table is key-cardinality-sized
    val cnt = keyed.groupBy(col("col_name"), col("k"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // top_key tie-break via min(struct(-count, key)): only the COUNT is
    // negated (always numeric), so the hottest key with smallest-key
    // tie-break is deterministic for ANY orderable key type — negating
    // the key column itself would null out non-numeric keys (ANSI off)
    //
    // The Gini rank i runs over DISTINCT KEYS — data-sized for a real
    // join column (sf1: 1.5 M l_orderkeys in ONE col_name partition), so
    // the per-column row_number window is effectively a global sort (the
    // q93/q99/t13 "distinct values" class). rankViaBuckets' grouped form
    // replaces it: same (c asc, k asc) total order, ≤(groups·B)-entry
    // driver prior map, partitioned in-bucket windows. Σi·c is
    // rank-order-exact because the permutation is identical.
    // The rank VALUE here is a per-key count with a handful of distinct
    // values (l_orderkey df ∈ 1..17 at sf10), so value-only buckets
    // collapse to that handful and the biggest tie class (~3 M rows at
    // sf10) sorts in ONE window task. Measured adjudication (r14,
    // minimums across noisy-host runs): the value-only rank is 11-13 s
    // at sf10 while the tie-splitting form (splitTies=true — pair edges
    // on (c, k)) pays ~46 s in chain+sample overhead to remove a ~4 s
    // single-task sort. r15: the CODE now decides — autoSplitBudget arms
    // the derived predicate (largest histogram cell vs the task-memory
    // envelope, Prep.SplitTiesTaskBudget), which stays OFF through every
    // measured decade (3 M ≪ 16 M) and fires exactly when a tie cell
    // outgrows a task. (c, k) satisfy the pair-edge type requirements:
    // counts cast injectively, bigint keys cast monotonically, neither
    // null. Ranks are bucket-function-independent, so arming the switch
    // can never move a hash.
    val profile = graft.ops.Prep.rankViaBuckets(cnt, col("c"), col("k"),
        ascending = true, rankCol = "i", partitionKeys = Seq(col("col_name")),
        autoSplitBudget = graft.ops.Prep.SplitTiesTaskBudget)
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
        max(col("c")).as("max_count"),
        min(struct((-col("c")).as("nc"), col("k").as("tk"))).as("__top"),
        sum(col("i") * col("c")).as("__ic"))
      .select(col("col_name"), col("n_keys"), col("n_rows"), col("max_count"),
        col("__top.tk").as("top_key"),
        round(col("max_count") * col("n_keys").cast("double") /
          col("n_rows"), 6).as("skew_ratio"),
        round((lit(2) * col("__ic") - (col("n_keys") + 1) * col("n_rows"))
          .cast("double") / (col("n_keys") * col("n_rows")), 6).as("gini"))
    // A profiler's output is ONE ROW PER PROFILED COLUMN — materialize it
    // eagerly (a k-row driver pull, the A2 count→lit discipline) so the
    // key-cardinality-sized checkpoint can be FREED here instead of
    // leaking per call: a second same-session q145 run was measured 2.2×
    // slower at sf10 purely from the first run's retained 16.8 M-row
    // blocks (the r14 CC-loop residency lesson applied to the profiler).
    val rows = java.util.Arrays.asList(profile.collect(): _*)
    cnt.unpersist()
    keyed.sparkSession.createDataFrame(rows, profile.schema)
  }
}
