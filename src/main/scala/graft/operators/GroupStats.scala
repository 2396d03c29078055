package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{count, lit, max, min}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-file-group column statistics for manifest-level data skipping on
  * [[Versioned]] tables — the Delta/Iceberg "data skipping" economics
  * (min/max per file in the transaction log / manifest) rebuilt on the
  * same two primitives the rest of [[Versioned]] uses: an immutable
  * group directory and a tiny JSON sidecar written BEFORE the manifest
  * publishes.
  *
  * Why it matters at 100 TB: a year of daily appends is ~365 file
  * groups, and most predicates (an id range, a date window, one
  * language) touch a handful of them. Parquet row-group statistics
  * prune AFTER a task has been scheduled per file; group-level stats
  * prune at PLANNING time on the driver from a few KB of JSON — the
  * scan never lists, opens, or schedules the excluded groups. That is
  * the difference between a 365-group listing+footer pass and reading
  * the three groups a week-long window actually needs.
  *
  * Correctness stance: skipping is an OPTIMIZATION, never the filter.
  * [[mayMatch]] answers "could any row in this group satisfy the
  * predicate?" and errs toward `true` on anything it cannot prove
  * (unknown operator, missing stat, type mismatch, NaN); the caller
  * ([[Versioned.readWhere]]) always applies the full predicate to the
  * surviving rows. A group is excluded only when its bounds make a
  * match impossible.
  *
  * Stats sidecar: `files/<group>/_stats.json` — the `_` prefix keeps
  * it invisible to Spark's file listing (batch and streaming), and
  * living inside the group dir means [[Versioned.vacuum]]'s recursive
  * delete reclaims it with the data. Written once, before the manifest
  * that references the group, so a published version's stats are
  * always complete; groups written before this feature simply lack the
  * sidecar and are conservatively kept. */
object GroupStats {

  /** One column's stats. `tag` names the comparison domain; `min`/`max`
    * are `None` when unknown (all-null column, non-finite float bound,
    * over-long string upper bound) — absence always means "cannot
    * prune on this side". String minima may be stored truncated (a
    * prefix is lexicographically <= the true min, so the lower bound
    * stays conservative); string maxima are dropped instead (a prefix
    * UNDER-estimates an upper bound, which could prune a matching
    * group — the Delta-style asymmetry). */
  final case class ColStat(tag: String, min: Option[Any], max: Option[Any], nulls: Long)

  final case class Stats(nRows: Long, cols: Map[String, ColStat]) {
    /** Case-insensitive column lookup (Spark resolution is
      * case-insensitive by default). */
    def col(name: String): Option[ColStat] =
      cols.get(name).orElse(cols.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      })
  }

  private val MaxStringStat = 256

  /** Types whose min/max order we can store and compare. Complex types
    * (arrays, structs, maps, binary) are skipped — no stat, no prune. */
  private def eligible(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType | _: StringType |
         _: BooleanType | _: DateType | _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }

  private def tagOf(dt: DataType): String = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => "long"
    case _: FloatType | _: DoubleType                              => "double"
    case _: DecimalType                                            => "decimal"
    case _: StringType                                             => "string"
    case _: BooleanType                                            => "boolean"
    case _: DateType                                               => "date"
    case _                                                         => "timestamp"
  }

  /** Normalize an aggregate-result value (java.sql or java.time flavors
    * both appear, depending on `spark.sql.datetime.java8API.enabled`)
    * into the storage domain for its tag: Long / Double / BigDecimal /
    * String / Boolean. Returns None for values that cannot serve as a
    * bound (non-finite floats). */
  private def normalize(tag: String, v: Any): Option[Any] = v match {
    case null => None
    case b: java.lang.Byte => Some(b.longValue)
    case s: java.lang.Short => Some(s.longValue)
    case i: java.lang.Integer => Some(i.longValue)
    case l: java.lang.Long => Some(l.longValue)
    case f: java.lang.Float =>
      if (f.isNaN || f.isInfinite) None else Some(f.doubleValue)
    case d: java.lang.Double =>
      if (d.isNaN || d.isInfinite) None else Some(d.doubleValue)
    case d: java.math.BigDecimal => Some(d)
    case d: BigDecimal => Some(d.bigDecimal)
    case s: String => Some(s)
    case b: java.lang.Boolean => Some(b.booleanValue)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case t: java.sql.Timestamp =>
      val i = t.toInstant
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case t: java.time.LocalDateTime =>
      val i = t.toInstant(java.time.ZoneOffset.UTC)
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case other =>
      // Unknown runtime flavor: no bound rather than a wrong bound.
      val _ = other
      None
  }

  /** Fields of `schema` that get stats, in schema order. */
  private[operators] def statFields(schema: StructType): Seq[StructField] =
    schema.fields.filter(f => eligible(f.dataType)).toSeq

  /** The stats aggregates over `df`'s eligible columns: one `__n` row
    * count plus (min, max, non-null count) per field — the single
    * expression list behind both [[compute]] (a standalone aggregate
    * over an already-written group) and [[observedAggs]] (the same
    * metrics collected DURING a write). */
  private def statAggs(
      df: DataFrame, fields: Seq[StructField]): Seq[org.apache.spark.sql.Column] =
    count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = df.col(f.name)
      Seq(min(c).as(s"__min_${f.name}"), max(c).as(s"__max_${f.name}"),
        count(c).as(s"__nn_${f.name}"))
    }

  private def buildStats(
      fields: Seq[StructField], n: Long, value: String => Any): Stats = {
    val cols = fields.map { f =>
      val tag = tagOf(f.dataType)
      val nonNull = value(s"__nn_${f.name}").asInstanceOf[Long]
      var mn = normalize(tag, value(s"__min_${f.name}"))
      var mx = normalize(tag, value(s"__max_${f.name}"))
      if (tag == "string") {
        // Truncation asymmetry: prefix is a valid (conservative) lower
        // bound, never a valid upper bound.
        mn = mn.map { case s: String if s.length > MaxStringStat => s.substring(0, MaxStringStat); case v => v }
        mx = mx.flatMap { case s: String if s.length > MaxStringStat => None; case v => Some(v) }
      }
      f.name -> ColStat(tag, mn, mx, n - nonNull)
    }.toMap
    Stats(n, cols)
  }

  /** Compute (rowCount, stats) in ONE aggregate pass over `df`. Used
    * where a group exists WITHOUT write lineage (clustered staging
    * moves, CONVERT adoption, checkpoint back-fill); the write path
    * collects the same metrics during the write via [[observedAggs]]. */
  def compute(df: DataFrame): Stats = {
    val fields = statFields(df.schema)
    val aggs = statAggs(df, fields)
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    buildStats(fields, row.getLong(0),
      name => row.get(row.fieldIndex(name)))
  }

  /** The stats aggregates shaped for `Dataset.observe`: attach to the
    * DataFrame being written, run the write, then turn the observed
    * metric map into [[Stats]] with [[fromObserved]]. One pass instead
    * of write + read-back — the same values, computed from the exact
    * rows the writer emitted (the CollectMetrics node sits in the write
    * plan itself, so non-deterministic inputs cannot diverge). */
  def observedAggs(df: DataFrame): Seq[org.apache.spark.sql.Column] =
    statAggs(df, statFields(df.schema))

  def fromObserved(schema: StructType, metrics: Map[String, Any]): Stats =
    buildStats(statFields(schema), metrics("__n").asInstanceOf[Long],
      name => metrics.getOrElse(name, null))

  /** Per-key stats in ONE grouped aggregate pass — for writers that
    * stage many groups in a single job ([[Versioned.cluster]]'s
    * partitioned staging write): N per-group read-back jobs collapse
    * into one scan. `keyCol` itself gets no stats (it is the staging
    * partition column, dropped on rename). */
  def computeByKey(df: DataFrame, keyCol: String): Map[Long, Stats] = {
    val fields = statFields(StructType(
      df.schema.fields.filterNot(_.name.equalsIgnoreCase(keyCol))))
    val aggs = statAggs(df, fields)
    val rows = df.groupBy(df.col(keyCol).cast("long").as("__key"))
      .agg(aggs.head, aggs.tail: _*).collect()
    rows.map { row =>
      row.getLong(row.fieldIndex("__key")) ->
        buildStats(fields, row.getLong(row.fieldIndex("__n")),
          name => row.get(row.fieldIndex(name)))
    }.toMap
  }

  // ---- JSON sidecar ----------------------------------------------------

  private def valueToJson(tag: String, v: Any): JValue = (tag, v) match {
    case (_, l: Long)                  => JLong(l)
    case (_, d: Double)                => JDouble(d)
    case ("decimal", d: java.math.BigDecimal) => JString(d.toPlainString)
    case (_, s: String)                => JString(s)
    case (_, b: Boolean)               => JBool(b)
    case _                             => JNull
  }

  private def valueFromJson(tag: String, j: JValue): Option[Any] = (tag, j) match {
    case ("long" | "date" | "timestamp", JLong(l)) => Some(l)
    case ("long" | "date" | "timestamp", JInt(i))  => Some(i.toLong)
    case ("double", JDouble(d))                    => Some(d)
    case ("double", JLong(l))                      => Some(l.toDouble)
    case ("double", JInt(i))                       => Some(i.toDouble)
    case ("decimal", JString(s))                   => Some(new java.math.BigDecimal(s))
    case ("string", JString(s))                    => Some(s)
    case ("boolean", JBool(b))                     => Some(b)
    case _                                         => None
  }

  def toJson(stats: Stats): String = {
    val cols = JObject(stats.cols.toList.sortBy(_._1).map { case (name, cs) =>
      name -> JObject(List(
        "t" -> JString(cs.tag),
        "min" -> cs.min.map(valueToJson(cs.tag, _)).getOrElse(JNull),
        "max" -> cs.max.map(valueToJson(cs.tag, _)).getOrElse(JNull),
        "nulls" -> JLong(cs.nulls)))
    })
    JsonMethods.compact(JsonMethods.render(
      JObject("n_rows" -> JLong(stats.nRows), "cols" -> cols)))
  }

  def fromJson(raw: String): Stats = {
    val j = JsonMethods.parse(raw)
    val n = (j \ "n_rows") match {
      case JLong(l) => l; case JInt(i) => i.toLong; case _ => 0L
    }
    val cols = (j \ "cols") match {
      case JObject(fields) => fields.map { case (name, cj) =>
        val tag = (cj \ "t") match { case JString(s) => s; case _ => "" }
        val nulls = (cj \ "nulls") match {
          case JLong(l) => l; case JInt(i) => i.toLong; case _ => 0L
        }
        name -> ColStat(tag, valueFromJson(tag, cj \ "min"),
          valueFromJson(tag, cj \ "max"), nulls)
      }.toMap
      case _ => Map.empty[String, ColStat]
    }
    Stats(n, cols)
  }

  def sidecarPath(tableDir: String, group: String): Path =
    new Path(s"$tableDir/files/$group/_stats.json")

  def write(fs: FileSystem, path: Path, stats: Stats): Unit = {
    val out = fs.create(path, true)
    try out.write(toJson(stats).getBytes("UTF-8")) finally out.close()
  }

  /** Dev observability: sidecar reads since JVM start. ScaleCurve's
    * flat-mutation-planning probe asserts the per-mutation delta no
    * longer tracks group count (row totals now live in the manifest;
    * pruning stats reads are batched through [[readMany]]). */
  val readCount = new java.util.concurrent.atomic.AtomicLong(0L)

  def read(fs: FileSystem, path: Path): Option[Stats] = {
    readCount.incrementAndGet()
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      scala.util.Try(fromJson(raw)).toOption
    }
  }

  private lazy val sidecarPool = java.util.concurrent.Executors.newFixedThreadPool(
    16,
    (r: Runnable) => {
      val t = new Thread(r, "graft-sidecar-io")
      t.setDaemon(true)
      t
    })

  /** [[read]] over many sidecars CONCURRENTLY (bounded pool): one
    * driver-side metadata pass must not serialize one GET per group —
    * at 100k groups on an object store (~10-20 ms each) a serial loop
    * is tens of minutes; 16-way it is tens of seconds, and the common
    * callers no longer need it at all (manifest row counts). Order is
    * preserved. */
  def readMany(fs: FileSystem, paths: Seq[Path]): Seq[Option[Stats]] =
    if (paths.size <= 2) paths.map(read(fs, _))
    else {
      import scala.jdk.CollectionConverters._
      val tasks: Seq[java.util.concurrent.Callable[Option[Stats]]] =
        paths.map(p => (() => read(fs, p)): java.util.concurrent.Callable[Option[Stats]])
      sidecarPool.invokeAll(tasks.asJava).asScala.toSeq.map(_.get())
    }

  // ---- Pruning ---------------------------------------------------------

  /** The comparison domain behind a tag: numeric-like tags compare as
    * BigDecimal, strings as String. Cross-domain comparisons (a string
    * column against a numeric literal) return None → no pruning. */
  private def toOrdered(tag: String, v: Any): Option[Either[java.math.BigDecimal, String]] =
    (tag, v) match {
      case ("string", s: String) => Some(scala.util.Right(s))
      case ("string", _) => None
      case (_, l: Long) => Some(scala.util.Left(java.math.BigDecimal.valueOf(l)))
      case (_, d: Double) =>
        if (d.isNaN || d.isInfinite) None
        else Some(scala.util.Left(java.math.BigDecimal.valueOf(d)))
      case (_, d: java.math.BigDecimal) => Some(scala.util.Left(d))
      case (_, b: Boolean) => Some(scala.util.Left(java.math.BigDecimal.valueOf(if (b) 1L else 0L)))
      case _ => None
    }

  private def cmp(a: Either[java.math.BigDecimal, String],
                  b: Either[java.math.BigDecimal, String]): Option[Int] = (a, b) match {
    case (scala.util.Left(x), scala.util.Left(y))   => Some(x.compareTo(y))
    case (scala.util.Right(x), scala.util.Right(y)) => Some(x.compareTo(y))
    case _                    => None
  }

  /** A bare column reference, possibly under an EXACT widening cast (the
    * analyzer's type promotion: an int column compared to a long/double
    * literal becomes `cast(col)`). Unwrapped only when the cast is
    * value-exact into the BigDecimal comparison domain — byte/short/int
    * into any wider numeric, long into long/decimal, float into double —
    * so bounds comparisons stay order-correct. A long→double or
    * int→float cast ROUNDS (2^53/2^24 mantissa cliffs) and a
    * string→numeric cast reorders, so those keep the group instead. */
  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case c: Cast =>
      val exact = (c.child.dataType, c.dataType) match {
        case (_: ByteType | _: ShortType | _: IntegerType,
              _: ShortType | _: IntegerType | _: LongType | _: FloatType |
              _: DoubleType | _: DecimalType) => true
        case (_: LongType, _: LongType | _: DecimalType) => true
        case (_: FloatType, _: DoubleType) => true
        case _ => false
      }
      if (exact) attrName(c.child) else None
    case _ => None
  }

  /** Extract a (columnName, literalValue) pair from a binary comparison,
    * normalizing the literal's Catalyst-internal value into the storage
    * domain. `flipped` = the attribute was on the right. */
  private def attrLit(l: Expression, r: Expression): Option[(String, Any, Boolean)] =
    (l, r) match {
      case (AttrName(name), Literal(v, dt)) =>
        literalValue(v, dt).map(x => (name, x, false))
      case (Literal(v, dt), AttrName(name)) =>
        literalValue(v, dt).map(x => (name, x, true))
      case _ => None
    }

  private object AttrName {
    def unapply(e: Expression): Option[String] = attrName(e)
  }

  /** Catalyst internal literal → storage-domain value (Long / Double /
    * BigDecimal / String / Boolean), matching [[normalize]]'s domains:
    * dates are epoch days, timestamps epoch micros — exactly how
    * Catalyst stores them internally, so no conversion is needed. */
  private def literalValue(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (null, _) => None
    case (b: Byte, _) => Some(b.toLong)
    case (s: Short, _) => Some(s.toLong)
    case (i: Int, _: DateType) => Some(i.toLong)
    case (i: Int, _) => Some(i.toLong)
    case (l: Long, _) => Some(l)
    case (f: Float, _) => if (f.isNaN || f.isInfinite) None else Some(f.toDouble)
    case (d: Double, _) => if (d.isNaN || d.isInfinite) None else Some(d)
    case (d: Decimal, _) => Some(d.toJavaBigDecimal)
    case (u: org.apache.spark.unsafe.types.UTF8String, _) => Some(u.toString)
    case (b: Boolean, _) => Some(b)
    case _ => None
  }

  /** Could any row of a group with `stats` satisfy `pred`? `pred` is a
    * RESOLVED Catalyst predicate — [[Versioned.readWhere]] takes it from
    * the filtered scan's optimized plan, so attribute references carry
    * real names, literals are type-promoted, and `between`/`isin` have
    * been lowered to the comparisons below. Conservative: `true` unless
    * the stats PROVE no row can match. Handles And / Or / the binary
    * comparisons / In / InSet / IsNull / IsNotNull / EqualNullSafe /
    * StartsWith / Not(EqualTo); everything else keeps the group. */
  def mayMatch(stats: Stats, pred: Expression): Boolean = mayMatchExpr(stats, pred)

  private def mayMatchExpr(stats: Stats, e: Expression): Boolean = e match {
    case And(l, r) => mayMatchExpr(stats, l) && mayMatchExpr(stats, r)
    case Or(l, r)  => mayMatchExpr(stats, l) || mayMatchExpr(stats, r)

    case EqualTo(l, r) => attrLit(l, r) match {
      case Some((name, v, _)) => couldEqual(stats, name, v)
      case None => true
    }
    case EqualNullSafe(l, r) => (l, r) match {
      case (AttrName(name), Literal(null, _)) => couldBeNull(stats, name)
      case (Literal(null, _), AttrName(name)) => couldBeNull(stats, name)
      case _ => attrLit(l, r) match {
        case Some((name, v, _)) => couldEqual(stats, name, v)
        case None => true
      }
    }

    case GreaterThan(l, r) => attrLit(l, r) match {
      case Some((name, v, false)) => couldBeAbove(stats, name, v, strict = true)
      case Some((name, v, true))  => couldBeBelow(stats, name, v, strict = true)
      case None => true
    }
    case GreaterThanOrEqual(l, r) => attrLit(l, r) match {
      case Some((name, v, false)) => couldBeAbove(stats, name, v, strict = false)
      case Some((name, v, true))  => couldBeBelow(stats, name, v, strict = false)
      case None => true
    }
    case LessThan(l, r) => attrLit(l, r) match {
      case Some((name, v, false)) => couldBeBelow(stats, name, v, strict = true)
      case Some((name, v, true))  => couldBeAbove(stats, name, v, strict = true)
      case None => true
    }
    case LessThanOrEqual(l, r) => attrLit(l, r) match {
      case Some((name, v, false)) => couldBeBelow(stats, name, v, strict = false)
      case Some((name, v, true))  => couldBeAbove(stats, name, v, strict = false)
      case None => true
    }

    case In(AttrName(name), list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
      list.exists { case Literal(v, dt) =>
        literalValue(v, dt) match {
          case Some(x) => couldEqual(stats, name, x)
          case None    => true // null / unconvertible element: keep
        }
      }

    // The optimizer lowers big `isin` lists to InSet over internal
    // values; the child's dataType recovers their domain.
    case s @ InSet(AttrName(name), hset) if hset.nonEmpty =>
      hset.exists { v =>
        literalValue(v, s.child.dataType) match {
          case Some(x) => couldEqual(stats, name, x)
          case None    => true
        }
      }

    case IsNull(AttrName(name))    => couldBeNull(stats, name)
    case IsNotNull(AttrName(name)) => couldBeNonNull(stats, name)

    case StartsWith(AttrName(name), Literal(p, _: StringType)) if p != null =>
      couldStartWith(stats, name, p.toString)

    // Not(=v) prunes exactly the constant groups: every row equals v.
    case Not(EqualTo(l, r)) => attrLit(l, r) match {
      case Some((name, v, _)) => !allRowsEqual(stats, name, v)
      case None => true
    }

    // Function calls, attribute-vs-attribute comparisons, subquery
    // shapes, anything else: keep.
    case _ => true
  }

  private def statFor(stats: Stats, name: String): Option[ColStat] = stats.col(name)

  private def nonNullCount(stats: Stats, cs: ColStat): Long = stats.nRows - cs.nulls

  private def couldBeNull(stats: Stats, name: String): Boolean =
    statFor(stats, name).forall(_.nulls > 0)

  private def couldBeNonNull(stats: Stats, name: String): Boolean =
    statFor(stats, name).forall(cs => nonNullCount(stats, cs) > 0)

  private def couldEqual(stats: Stats, name: String, v: Any): Boolean =
    statFor(stats, name).forall { cs =>
      if (nonNullCount(stats, cs) <= 0) false
      else toOrdered(cs.tag, v) match {
        case None => true
        case Some(ov) =>
          val aboveMin = cs.min.flatMap(m => toOrdered(cs.tag, m))
            .flatMap(om => cmp(ov, om)).forall(_ >= 0)
          val belowMax = cs.max.flatMap(m => toOrdered(cs.tag, m))
            .flatMap(om => cmp(ov, om)).forall(_ <= 0)
          aboveMin && belowMax
      }
    }

  /** Could a row exist with value > v (strict) / >= v? */
  private def couldBeAbove(stats: Stats, name: String, v: Any, strict: Boolean): Boolean =
    statFor(stats, name).forall { cs =>
      if (nonNullCount(stats, cs) <= 0) false
      else toOrdered(cs.tag, v) match {
        case None => true
        case Some(ov) =>
          cs.max.flatMap(m => toOrdered(cs.tag, m)).flatMap(om => cmp(om, ov)) match {
            case Some(c) => if (strict) c > 0 else c >= 0
            case None    => true
          }
      }
    }

  /** Could a row exist with value < v (strict) / <= v? */
  private def couldBeBelow(stats: Stats, name: String, v: Any, strict: Boolean): Boolean =
    statFor(stats, name).forall { cs =>
      if (nonNullCount(stats, cs) <= 0) false
      else toOrdered(cs.tag, v) match {
        case None => true
        case Some(ov) =>
          cs.min.flatMap(m => toOrdered(cs.tag, m)).flatMap(om => cmp(om, ov)) match {
            case Some(c) => if (strict) c < 0 else c <= 0
            case None    => true
          }
      }
    }

  /** Strings with prefix p live in [p, p·∞): prune when max < p, or when
    * min > p without sharing the prefix (then every value exceeds the
    * whole prefix range). The stored min may itself be a truncated
    * prefix, which only weakens (never wrongs) the second test. */
  private def couldStartWith(stats: Stats, name: String, p: String): Boolean =
    statFor(stats, name).forall { cs =>
      if (cs.tag != "string") true
      else if (nonNullCount(stats, cs) <= 0) false
      else {
        val maxOk = cs.max.forall { case m: String => m.compareTo(p) >= 0; case _ => true }
        val minOk = cs.min.forall {
          case m: String => m.compareTo(p) <= 0 || m.startsWith(p)
          case _ => true
        }
        maxOk && minOk
      }
    }

  /** Provably every row equals v: min == max == v and no nulls. */
  private def allRowsEqual(stats: Stats, name: String, v: Any): Boolean =
    statFor(stats, name).exists { cs =>
      cs.nulls == 0 && stats.nRows > 0 &&
        (for {
          ov <- toOrdered(cs.tag, v)
          mn <- cs.min.flatMap(m => toOrdered(cs.tag, m))
          mx <- cs.max.flatMap(m => toOrdered(cs.tag, m))
          cMin <- cmp(ov, mn); cMax <- cmp(ov, mx)
        } yield cMin == 0 && cMax == 0).getOrElse(false)
    }
}
