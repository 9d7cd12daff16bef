package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: merge a change stream onto a base
  * snapshot (the warehouse MERGE / upsert the reference approximates
  * with per-row REPLACE INTO — `DataIngesting.py:48-64` re-ingests the
  * station dimension wholesale; at warehouse scale the idiom is a
  * keyed delta apply).
  *
  * Semantics (SCD type 1): the change log carries `(key, order, op,
  * new values)` rows; per key the LAST change (by `orderCols`) wins.
  * `op = "D"` deletes the key; any other op upserts — updating the
  * mapped columns of an existing base row, or inserting a new row
  * (unmapped base columns stay NULL on inserts). Base rows with no
  * change pass through untouched. Output schema = base schema.
  *
  * Scale shape: change compaction is the single-shuffle `max_by` of
  * [[Relational.latestPerGroup]] (map-side partial collapses each
  * partition to ≤|keys| rows), and the apply is ONE full-outer
  * equi-join on the key — both exchanges hash on the same key, so the
  * compacted side's partitioning is reused by the join. No broadcast
  * assumption (a day's delta can be as big as the base), no driver
  * materialization, no window over the base.
  */
object Cdc {

  /** @param keyCols    join key, same column names on both sides
    * @param orderCols  change-log ordering; the max wins per key
    * @param opCol      change column holding "D" for delete, anything
    *                   else for upsert
    * @param updateCols base column -> change column carrying its new
    *                   value on upsert
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      opCol: String,
      updateCols: Map[String, String]): DataFrame = {
    val payloadCols = (updateCols.values.toSeq :+ opCol).distinct
    val compacted = Relational.latestPerGroup(changes, keyCols, orderCols, payloadCols)
    val chg = compacted.select(
      (keyCols.map(k => col(k).as(s"__chg_$k")) ++
        payloadCols.map(p => col(p).as(s"__chg_$p"))): _*)
    val on = keyCols.map(k => base(k) === chg(s"__chg_$k")).reduce(_ && _)
    val joined = base.join(chg, on, "full_outer")
    val isChange = chg(s"__chg_$opCol").isNotNull
    val outCols = base.columns.toSeq.map { bc =>
      if (keyCols.contains(bc)) coalesce(base(bc), chg(s"__chg_$bc")).as(bc)
      else updateCols.get(bc) match {
        case Some(cc) => when(isChange, chg(s"__chg_$cc")).otherwise(base(bc)).as(bc)
        case None     => base(bc).as(bc)
      }
    }
    joined
      .filter(chg(s"__chg_$opCol").isNull || chg(s"__chg_$opCol") =!= "D")
      .select(outCols: _*)
  }

  /** SCD type-2 dimension build: turn a change log into validity
    * intervals — one row per (key, change) with `valid_from` = the
    * change's timestamp, `valid_to` = the NEXT change's timestamp
    * (null while current), and `is_current`. The history-preserving
    * complement of [[applyChanges]]'s last-wins overwrite: point-in-
    * time joins (`fact.ts >= valid_from AND (fact.ts < valid_to OR
    * valid_to IS NULL)`) read any past state of the dimension.
    *
    * Scale shape: ONE shuffle on the key; `valid_to` is a per-key
    * `lead` over the change ordering, so task size is bounded by a
    * single key's change history (dimension keys change thousands of
    * times, not billions — the safe side of the window-vs-aggregate
    * line; contrast the hash-keyed dedup marking CLAUDE.md pins as
    * aggregate-only).
    *
    * `orderCols` must totally order each key's changes (ties would
    * make interval boundaries nondeterministic) — pass a tiebreaker
    * (sequence id) alongside the timestamp, exactly as
    * [[applyChanges]] requires.
    */
  def scd2(
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(Seq("valid_from", "valid_to", "is_current")
        .forall(c => !changes.columns.contains(c)),
      "valid_from/valid_to/is_current are reserved output names of scd2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Snapshot reconciliation: diff two keyed snapshots of the same
    * table into the change set that turns `base` into `current` —
    * `I` (key only in current), `D` (key only in base), `U` (key in
    * both, any compared column differs under null-safe equality).
    * Unchanged keys are dropped, so the output is sized to the DRIFT,
    * not the table — the validation primitive for migration cutovers
    * and replica audits ("did the copy land?") where materializing
    * anything proportional to the 100 TB input would be the bug.
    *
    * `changed_cols` names the differing columns (sorted,
    * comma-joined) on `U` rows and is empty otherwise — enough to
    * route a repair without shipping the values themselves; callers
    * that need them re-join the keys back to either snapshot.
    *
    * Scale shape: ONE full-outer equi-join on the key (both sides
    * shuffle-hash on the same key, no broadcast assumption — the
    * snapshots are peers), comparisons evaluate row-local in the
    * join's projection, and the filter drops the unchanged bulk
    * before anything else sees it. Keys must be non-null (a null key
    * never equi-joins, so it would always read as I+D drift).
    */
  def snapshotDiff(
      base: DataFrame,
      current: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(Seq("change", "changed_cols")
        .forall(c => !keyCols.contains(c)),
      "change/changed_cols are reserved output names of snapshotDiff")
    val cmp =
      (if (compareCols.nonEmpty) compareCols
       else base.columns.toSeq.filter(c =>
         !keyCols.contains(c) && current.columns.contains(c))).sorted
    val b = base.select(
      keyCols.map(col) ++ cmp.map(c => col(c).as(s"__b_$c")) :+
        lit(1).as("__b"): _*)
    val c = current.select(
      keyCols.map(col) ++ cmp.map(x => col(x).as(s"__c_$x")) :+
        lit(1).as("__c"): _*)
    // Seq-key join coalesces the key columns across the full outer.
    val joined = b.join(c, keyCols, "full_outer")
    val differs = cmp.map(x => !(col(s"__b_$x") <=> col(s"__c_$x")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val change = when(col("__b").isNull, "I")
      .when(col("__c").isNull, "D")
      .when(differs, "U")
    val changedCols = concat_ws(",",
      cmp.map(x => when(!(col(s"__b_$x") <=> col(s"__c_$x")), lit(x))): _*)
    joined.withColumn("change", change)
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change") :+
        when(col("change") === "U", changedCols).otherwise(lit(""))
          .as("changed_cols"): _*)
  }
}
