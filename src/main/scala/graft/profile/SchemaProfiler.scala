package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.InferredType

/** Per-path field profile (reference: hashtable keyed by dotted path,
  * private/Analyze_scheme.ps1:163-171). */
case class FieldProfile(
    path: String,
    types: Map[String, Long],     // type histogram, Analyze_scheme.ps1:178-184
    count: Long,                  // occurrence count, :174-175
    isNested: Boolean,
    isArray: Boolean,
    arrayElementTypes: Map[String, Long], // :194-201
    samples: Seq[String],         // ≤3 values truncated to 50 chars, :216-226
    /** TRUE maximum value length over the profiled sample — measured before
      * display truncation, unlike the reference whose VARCHAR(MAX) split is
      * unreachable because it sizes from pre-truncated samples (quirk Q4). */
    maxLen: Option[Long] = None) {
  /** Majority-type election (A3; Sql_Schema_Generator.ps1:416). Ties break to
    * the lexicographically smallest tag for determinism. */
  def electedType: String =
    if (types.isEmpty) "null"
    else types.toSeq.sortBy { case (t, c) => (-c, t) }.head._1
}

/** Collected schema profile of a document collection. Bounded by schema size
  * (paths × types), never by data size — safe to hold on the driver. */
case class SchemaProfile(totalDocs: Long, fields: Seq[FieldProfile]) {
  def apply(path: String): FieldProfile = byPath(path)
  lazy val byPath: Map[String, FieldProfile] = fields.map(f => f.path -> f).toMap
  def has(path: String): Boolean = byPath.contains(path)

  /** P4: human-readable profile report (Analyze_scheme.ps1:269-349). */
  def describe: String = {
    val sb = new StringBuilder
    sb.append(s"Schema profile over $totalDocs documents\n")
    fields.sortBy(_.path).foreach { f =>
      val pct = if (totalDocs == 0) 0.0 else math.round(f.count * 10000.0 / totalDocs) / 100.0
      val ts = f.types.toSeq.sortBy { case (t, c) => (-c, t) }
        .map { case (t, c) => s"$t($c)" }.mkString(", ")
      sb.append(f"  ${f.path}%-40s $pct%6.2f%% [$ts]")
      if (f.isArray) {
        val es = f.arrayElementTypes.toSeq.sortBy { case (t, c) => (-c, t) }
          .map { case (t, c) => s"$t($c)" }.mkString(", ")
        sb.append(s" elements=[$es]")
      }
      if (f.samples.nonEmpty) sb.append(s" samples=${f.samples.mkString("; ")}")
      sb.append('\n')
    }
    val nNested = fields.count(_.isNested)
    val nArray = fields.count(_.isArray)
    sb.append(s"  ${fields.size} paths, $nNested nested, $nArray array\n") // A10
    sb.toString
  }
}

/** Statistical schema inference over document collections (P1-P4;
  * reference Analyze_scheme.ps1:101-228).
  *
  * The reference folds documents one at a time on a single thread. Here each
  * row is flattened to `(path, type-tag)` observation tuples with pure
  * built-in expressions (`transform`/`flatten`/`concat`/`explode` — all
  * whole-stage-codegen'd), then aggregated with one hash aggregation. At
  * 100 TB this is a single scan with map-side partial aggregation; the
  * reduced state is bounded by #paths × #types, not by rows, so the final
  * shuffle is trivially small. No UDFs, no driver-side loops.
  *
  * Path grammar matches the reference: nested `parent.child`, array elements
  * `parent[]` / `parent[].child` (Analyze_scheme.ps1:160, 206).
  */
object SchemaProfiler {
  private val obsSchema: DataType =
    ArrayType(StructType(Seq(
      StructField("path", StringType), StructField("ftype", StringType))))
  private def emptyObs: Column = array().cast(obsSchema)

  private def tagLit(dt: DataType): Column = lit(InferredType.of(dt).tag)

  /** Observation array for one element of an array column (path `base[]`).
    * Struct elements contribute the element itself plus one observation per
    * field, mirroring the reference's per-element recursion with the `[]`
    * path suffix (Analyze_scheme.ps1:203-207). */
  private def elemObs(arr: Column, et: DataType, base: String): Column = et match {
    case st: StructType =>
      flatten(transform(arr, x => concat(
        when(isnull(x), emptyObs).otherwise(
          array(struct(lit(base).as("path"), lit("object").as("ftype")))) +:
        st.fields.toSeq.map { f =>
          val v = x.getField(f.name)
          when(isnull(x), emptyObs).otherwise(array(struct(
            lit(s"$base.${f.name}").as("path"),
            when(isnull(v), lit("null")).otherwise(tagLit(f.dataType)).as("ftype"))))
        }: _*)))
    case _ =>
      transform(arr, x => struct(
        lit(base).as("path"),
        when(isnull(x), lit("null")).otherwise(tagLit(et)).as("ftype")))
  }

  /** Recursive observation builder. `present` guards children of null
    * parents: a missing object contributes no child paths, exactly like a
    * document that lacks the subtree (Analyze_scheme.ps1:210-213). */
  private def obsFor(c: Column, dt: DataType, path: String, present: Column): Seq[Column] = {
    val selfTag = when(c.isNull, lit("null")).otherwise(tagLit(dt))
    val self = when(present,
      array(struct(lit(path).as("path"), selfTag.as("ftype")))).otherwise(emptyObs)
    val children = dt match {
      case st: StructType =>
        st.fields.toSeq.flatMap(f =>
          obsFor(c.getField(f.name), f.dataType, s"$path.${f.name}", present && c.isNotNull))
      case ArrayType(et, _) =>
        Seq(when(present && c.isNotNull, elemObs(c, et, s"$path[]")).otherwise(emptyObs))
      case _ => Nil
    }
    self +: children
  }

  /** One `(path, ftype)` row per field observation — the flattened form of
    * the reference's per-document recursive fold (P2). Row-explosion shape:
    * useful when observation streams from differently-typed frames are
    * unioned before aggregation (A3); [[profileDF]] has a cheaper
    * fixed-schema path. */
  def observations(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq.flatMap(f =>
      obsFor(col(f.name), f.dataType, f.name, lit(true)))
    df.select(explode(concat(cols: _*)).as("obs"))
      .select(col("obs.path").as("path"), col("obs.ftype").as("ftype"))
  }

  /** Per-row count contributions for every (path, ftype) combination the
    * schema can produce. Because a DataFrame column's type is STATIC, each
    * path observes at most its schema tag or "null" per row — so the whole
    * histogram is a fixed set of conditional counters, no row explosion.
    * Mirrors [[obsFor]]/[[elemObs]] semantics exactly (null array elements
    * of struct type contribute nothing; primitive nulls count as "null"). */
  private def histExprs(c: Column, dt: DataType, path: String,
      present: Column): Seq[(String, String, Column)] = {
    def cnt(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))
    val self = Seq(
      (path, InferredType.of(dt).tag, cnt(present && c.isNotNull)),
      (path, "null", cnt(present && c.isNull)))
    val children = dt match {
      case st: StructType =>
        st.fields.toSeq.flatMap(f => histExprs(
          c.getField(f.name), f.dataType, s"$path.${f.name}", present && c.isNotNull))
      case ArrayType(st: StructType, _) =>
        val base = s"$path[]"
        val live = when(present && c.isNotNull, c).otherwise(array().cast(ArrayType(st)))
        // non-null struct elements observe "object" at base; null elements
        // contribute nothing (elemObs struct branch)
        (base, "object", sum(size(filter(live, x => x.isNotNull)))) +:
          st.fields.toSeq.flatMap { f => Seq(
            (s"$base.${f.name}", InferredType.of(f.dataType).tag,
              sum(size(filter(live, x =>
                x.isNotNull && x.getField(f.name).isNotNull)))),
            (s"$base.${f.name}", "null",
              sum(size(filter(live, x =>
                x.isNotNull && x.getField(f.name).isNull)))))
          }
      case ArrayType(et, _) =>
        val base = s"$path[]"
        val live = when(present && c.isNotNull, c).otherwise(array().cast(ArrayType(et)))
        Seq(
          (base, InferredType.of(et).tag, sum(size(filter(live, x => x.isNotNull)))),
          (base, "null", sum(size(filter(live, x => x.isNull)))))
      case _ => Nil
    }
    self ++ children
  }

  /** A1/A2: per-(path, type) histogram as a DataFrame.
    *
    * Computed as ONE single-pass aggregation with a conditional counter per
    * possible (path, type) pair — a map-side partial aggregate whose state
    * is bounded by schema size, with no per-observation row explosion. At
    * 100 TB this is a plain scan; the old explode form materialized
    * #rows × #paths intermediate tuples only to count them. Zero-count
    * pairs are dropped, matching the observation semantics. */
  def profileDF(df: DataFrame): DataFrame = {
    val exprs = df.schema.fields.toSeq.flatMap(f =>
      histExprs(col(f.name), f.dataType, f.name, lit(true)))
    if (exprs.isEmpty)
      return df.sparkSession.emptyDataFrame
        .select(lit("").as("path"), lit("").as("ftype"), lit(0L).as("cnt"))
        .limit(0)
    val aliased = exprs.zipWithIndex.map { case ((_, _, e), i) => e.as(s"_c$i") }
    val one = df.agg(aliased.head, aliased.tail: _*)
    val rows = exprs.zipWithIndex.map { case ((p, t, _), i) =>
      struct(lit(p).as("path"), lit(t).as("ftype"),
        coalesce(col(s"_c$i"), lit(0L)).as("cnt"))
    }
    one.select(explode(array(rows: _*)).as("h"))
      .select(col("h.path").as("path"), col("h.ftype").as("ftype"),
        col("h.cnt").as("cnt"))
      .filter(col("cnt") > 0)
  }

  /** A3: per-path majority-type election as a DataFrame
    * (Sql_Schema_Generator.ps1:416). */
  def electedDF(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("path").orderBy(col("cnt").desc, col("ftype").asc)
    profileDF(df)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("path"), col("ftype").as("elected_type"))
  }

  /** Schema drift between two snapshots of a collection (the
    * analysis-phase counterpart of sync-time evolution S16/U2): per-path
    * status from a full-outer join of the two elected profiles —
    * `added` / `removed` / `type_changed` / `unchanged`, with the elected
    * types on both sides. Profile-sized frames; one join. */
  def profileDrift(before: DataFrame, after: DataFrame): DataFrame = {
    val ea = electedDF(before).select(col("path"),
      col("elected_type").as("type_before"))
    val eb = electedDF(after).select(col("path"),
      col("elected_type").as("type_after"))
    ea.join(eb, Seq("path"), "full_outer")
      .select(col("path"),
        when(col("type_before").isNull, "added")
          .when(col("type_after").isNull, "removed")
          .when(col("type_before") =!= col("type_after"), "type_changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("type_before"), lit("")).as("type_before"),
        coalesce(col("type_after"), lit("")).as("type_after"))
  }

  /** P1: sample-bounded profile driver (Analyze_scheme.ps1:41-99 takes
    * `min(sampleSize, N)` most-recent documents). `sampleKey` orders the
    * tail-sample; pass None to profile the whole input. */
  def profile(df: DataFrame, sampleSize: Int = 100,
      sampleKey: Option[String] = Some("_id")): SchemaProfile = {
    val sample = sampleKey match {
      case Some(k) if df.columns.contains(k) =>
        df.orderBy(col(k).desc).limit(sampleSize)
      case _ if sampleSize > 0 => df.limit(sampleSize)
      case _ => df
    }
    // collectProfile is ONE aggregation action now — no persist needed:
    // the sample plan runs exactly once either way, and skipping the cache
    // write/unpersist saves a round trip per profile call.
    collectProfile(sample)
  }

  /** Schema-only profile: when a collection is EMPTY the data-driven
    * histogram has nothing to count, but the frame still carries a schema —
    * derive the profile from it (count 0 per path, elected type = the
    * schema tag, same path grammar) so migrating an empty collection
    * produces correctly-typed empty tables instead of failing. At 100 TB an
    * empty daily partition must not crash the pipeline. */
  def fromSchema(schema: StructType): SchemaProfile = {
    def walk(dt: DataType, path: String): Seq[FieldProfile] = {
      val tag = InferredType.of(dt).tag
      val self = FieldProfile(path, Map(tag -> 0L), 0L,
        isNested = dt.isInstanceOf[StructType],
        isArray = dt.isInstanceOf[ArrayType],
        arrayElementTypes = dt match {
          case ArrayType(et, _) => Map(InferredType.of(et).tag -> 0L)
          case _ => Map.empty
        },
        samples = Seq.empty, maxLen = None)
      val children = dt match {
        case st: StructType =>
          st.fields.toSeq.flatMap(f => walk(f.dataType, s"$path.${f.name}"))
        case ArrayType(st: StructType, _) =>
          st.fields.toSeq.flatMap(f => walk(f.dataType, s"$path[].${f.name}"))
        case _ => Nil
      }
      self +: children
    }
    SchemaProfile(0L, schema.fields.toSeq.flatMap(f => walk(f.dataType, f.name)))
  }

  /** Collects the (small) per-path summary. Sample values: ≤3, truncated to
    * 47 chars + "..." (Analyze_scheme.ps1:216-226, X4).
    *
    * ONE aggregation action (guide §1.2 step 1 — fewer passes): the total
    * count, the (path, type) histogram counters, the per-path max lengths
    * and the ≤3 sample values are all aggregates over the same frame, so
    * they ride a single `agg` (one scan, one job) instead of the former
    * four actions (count + histogram + samples + max-lens — four scans of
    * the sample plan, four scheduling round trips per profile call, and a
    * persist/unpersist pair to make that affordable). */
  def collectProfile(sample: DataFrame): SchemaProfile = {
    val histE = sample.schema.fields.toSeq.flatMap(f =>
      histExprs(col(f.name), f.dataType, f.name, lit(true)))
    val sPaths = scalarPaths(sample.schema, "")
    val nH = histE.size
    val aggs: Seq[Column] =
      count(lit(1)).as("__total") +:
        (histE.zipWithIndex.map { case ((_, _, e), i) =>
          coalesce(e, lit(0L)).as(s"__h$i")
        } ++
        sPaths.zipWithIndex.map { case ((_, c), i) =>
          max(length(c.cast("string"))).as(s"__m$i")
        } ++
        sPaths.zipWithIndex.map { case ((_, c), i) =>
          val s = c.cast("string")
          val tr = when(length(s) > 50, concat(substring(s, 1, 47),
            lit("..."))).otherwise(s)
          slice(collect_list(tr), 1, 3).as(s"__s$i")
        })
    val row = sample.agg(aggs.head, aggs.tail: _*).collect().head
    val total = row.getLong(0)
    if (total == 0) return fromSchema(sample.schema)
    val hist = histE.zipWithIndex.flatMap { case ((p, t, _), i) =>
      val c = row.getLong(1 + i)
      if (c > 0) Some((p, t, c)) else None
    }.toArray
    val maxLens = sPaths.zipWithIndex.flatMap { case ((p, _), i) =>
      val idx = 1 + nH + i
      if (row.isNullAt(idx)) None
      else Some(p -> row.getAs[Number](idx).longValue())
    }.toMap
    val samples = sPaths.zipWithIndex.map { case ((p, _), i) =>
      p -> row.getSeq[String](1 + nH + sPaths.size + i).toSeq
    }.toMap
    // bare `path[]` entries are the element-type histogram of `path`;
    // `path[].child` entries are real fields (reference path grammar,
    // Analyze_scheme.ps1:203-207) and stay in the field list.
    val paths = hist.map(_._1).distinct.filterNot(_.endsWith("[]"))
    val elemHist = hist.filter(_._1.endsWith("[]"))
      .groupBy(t => t._1.stripSuffix("[]"))
      .view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val fields = paths.toSeq.sorted.map { p =>
      val types = hist.filter(_._1 == p).map(t => t._2 -> t._3).toMap
      FieldProfile(
        path = p,
        types = types,
        count = types.values.sum,
        isNested = types.contains("object"),
        isArray = types.contains("array"),
        arrayElementTypes = elemHist.getOrElse(p, Map.empty),
        samples = samples.getOrElse(p, Seq.empty),
        maxLen = maxLens.get(p))
    }
    SchemaProfile(total, fields)
  }

  private def scalarPaths(dt: DataType, prefix: String): Seq[(String, Column)] =
    dt match {
      case st: StructType => st.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case _: StructType => scalarPaths(f.dataType, p)
          case _: ArrayType => Nil
          case _ => Seq(p -> col(p))
        }
      }
      case _ => Nil
    }

}
