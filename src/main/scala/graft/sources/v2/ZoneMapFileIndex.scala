package graft.sources.v2

import java.util.concurrent.atomic.LongAdder

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.classic.{SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.types._

import graft.sources.ZoneMap

/** FILE-SKIPPING integrated into the connector's scan PLANNING: when a
  * snapshot carries a `_zonemap` sidecar ([[graft.sources.ZoneMap]] —
  * per-file min/max statistics), this file index drops data files whose
  * stat ranges cannot satisfy the query's pushed data filters BEFORE
  * any task is scheduled or footer opened. This is the Delta/Iceberg
  * data-skipping shape: at 100 TB a selective range query over a
  * clustered layout (sorted or Z-ordered, io05) schedules tasks only
  * for the files that can match, instead of discovering "nothing here"
  * inside millions of short tasks.
  *
  * SOUNDNESS RULES (pruning may only ever drop files that provably
  * hold no matching row):
  *  - a conjunct constrains the scan only when it is a supported
  *    comparison (`= <=> < <= > >= IN`) between an INDEXED column and
  *    literals of a stat-comparable type; every other expression
  *    contributes no constraint (kept conservative, incl. `OR` trees,
  *    functions, and non-indexed columns);
  *  - an all-null file carries null stats and is dropped only under a
  *    range/equality constraint (SQL comparisons never match null —
  *    same rule as [[ZoneMap.prunedRead]]); `IS NOT NULL` alone prunes
  *    nothing (the index keeps no null counts);
  *  - floating NaN literals disable the conjunct (NaN ordering differs
  *    between engines and stats);
  *  - STALENESS: if any current data file is missing from the index,
  *    pruning is DISABLED for the whole scan (one warning). Unlike
  *    [[ZoneMap.prunedRead]] — whose contract is prune-or-refuse —
  *    the connector treats the sidecar as a pure optimization: a
  *    stale index must never fail (or silently wrong) a routine read,
  *    it just stops paying for itself until refreshed
  *    ([[ZoneMap.refresh]] after each append).
  *
  * Observability: kept/pruned file counts accumulate on the companion
  * ([[ZoneMapFileIndex.filesKept]]/[[ZoneMapFileIndex.filesPruned]])
  * and each pruned scan logs one line — the spec asserts through the
  * counters, operations can watch the log.
  */
class ZoneMapFileIndex(spark: SparkSession, dataDir: String)
    extends InMemoryFileIndex(
      spark.asInstanceOf[ClassicSparkSession],
      Seq(new Path(dataDir)), Map.empty[String, String], None) {

  /** file name → indexed column → (min, max), both None for an
    * all-null file. Loaded once at index construction (O(files) rows,
    * the sidecar is a single small parquet). `None` = no usable index
    * (absent, unreadable, or not covering the current file set). */
  private val stats: Option[Map[String, Map[String, (Option[Any], Option[Any])]]] = {
    val idxDir = ZoneMap.indexPath(dataDir)
    val fs = GraftTables.fs(spark, dataDir)
    if (!fs.exists(new Path(idxDir, "_SUCCESS"))) None
    else {
      val idx = spark.read.parquet(idxDir)
      val cols = idx.columns.filter(_.startsWith("min_")).map(_.drop(4)).toSeq
      val byFile = idx.collect().map { r =>
        val file = r.getAs[String]("file")
        file -> cols.map { c =>
          c -> (Option(r.getAs[Any](s"min_$c")), Option(r.getAs[Any](s"max_$c")))
        }.toMap
      }.toMap
      val current = allFiles().map(_.getPath.getName).toSet
      val missing = current -- byFile.keySet
      if (missing.nonEmpty) {
        logWarning(s"zone map at $idxDir does not cover ${missing.size} current" +
          s" data file(s) (e.g. ${missing.head}) — pruning disabled; run" +
          " ZoneMap.refresh after appends")
        None
      } else Some(byFile)
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    stats match {
      case None => base
      case Some(byFile) =>
        val constraints = dataFilters.flatMap(ZoneMapFileIndex.constraint)
        if (constraints.isEmpty) base
        else {
          var kept = 0L; var pruned = 0L
          val out = base.map { pd =>
            val files = pd.files.filter { f =>
              val keep = byFile.get(f.getPath.getName) match {
                case None => true // unknown file (race): never drop
                case Some(ranges) => constraints.forall(c => c.canMatch(ranges))
              }
              if (keep) kept += 1 else pruned += 1
              keep
            }
            PartitionDirectory(pd.values, files)
          }
          ZoneMapFileIndex.filesKept.add(kept)
          ZoneMapFileIndex.filesPruned.add(pruned)
          if (pruned > 0)
            logInfo(s"zone map pruned $pruned/${kept + pruned} files of $dataDir")
          out
        }
    }
  }
}

object ZoneMapFileIndex {

  /** Cumulative planning-time skip counters (all indexes, this JVM). */
  val filesKept = new LongAdder
  val filesPruned = new LongAdder

  /** One column's requirement derived from a pushed conjunct. */
  sealed trait Constraint {
    def canMatch(ranges: Map[String, (Option[Any], Option[Any])]): Boolean
  }

  /** value must fall in one of `points`; range [lo,hi] must intersect. */
  private final case class PointIn(col: String, points: Seq[BigDecimal],
      strPoints: Seq[String]) extends Constraint {
    def canMatch(ranges: Map[String, (Option[Any], Option[Any])]): Boolean =
      ranges.get(col) match {
        case None => true // column not indexed
        case Some((None, None)) => false // all-null file: = never matches
        case Some((lo, hi)) =>
          points.exists(p => geNum(p, lo) && leNum(p, hi)) ||
            strPoints.exists(p => geStr(p, lo) && leStr(p, hi))
      }
  }

  /** file range must overlap (value op bound). `strict` = < / >. */
  private final case class Bound(col: String, lower: Boolean, strict: Boolean,
      num: Option[BigDecimal], str: Option[String]) extends Constraint {
    def canMatch(ranges: Map[String, (Option[Any], Option[Any])]): Boolean =
      ranges.get(col) match {
        case None => true
        case Some((None, None)) => false
        case Some((lo, hi)) =>
          // value > b needs file max > b; value < b needs file min < b
          val stat = if (lower) hi else lo
          (num, statNum(stat), str, statStr(stat)) match {
            case (Some(b), Some(s), _, _) =>
              if (lower) { if (strict) s > b else s >= b }
              else { if (strict) s < b else s <= b }
            case (_, _, Some(b), Some(s)) =>
              val c = cmpStr(s, b)
              if (lower) { if (strict) c > 0 else c >= 0 }
              else { if (strict) c < 0 else c <= 0 }
            case _ => true // type mismatch / missing one side: keep
          }
      }
  }

  private def statNum(v: Option[Any]): Option[BigDecimal] = v.flatMap(toNum)
  private def statStr(v: Option[Any]): Option[String] = v.flatMap {
    case s: String => Some(s); case _ => None
  }
  private def geNum(p: BigDecimal, lo: Option[Any]): Boolean =
    statNum(lo).forall(_ <= p)
  private def leNum(p: BigDecimal, hi: Option[Any]): Boolean =
    statNum(hi).forall(_ >= p)
  /** Code-point (UTF-8 binary) string order — the order Spark computes
    * min/max and compares strings in (UTF8String). Java's natural
    * String order is UTF-16 code-UNIT order, which DISAGREES beyond
    * the BMP (supplementary characters encode as surrogate pairs that
    * sort below U+E000..U+FFFF) — comparing persisted stats with it
    * could wrongly prune a file. */
  private def cmpStr(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
  private def geStr(p: String, lo: Option[Any]): Boolean =
    statStr(lo).forall(s => cmpStr(s, p) <= 0)
  private def leStr(p: String, hi: Option[Any]): Boolean =
    statStr(hi).forall(s => cmpStr(s, p) >= 0)

  /** Stat values arrive as the zone-map parquet's EXTERNAL row types;
    * normalize every numeric-ish type onto BigDecimal (exact for
    * int64, total order for the comparisons we do). */
  private def toNum(v: Any): Option[BigDecimal] = v match {
    case b: Byte => Some(BigDecimal(b.toInt))
    case s: Short => Some(BigDecimal(s.toInt))
    case i: Int => Some(BigDecimal(i))
    case l: Long => Some(BigDecimal(l))
    case f: Float => if (f.isNaN) None else Some(BigDecimal(f.toDouble))
    case d: Double => if (d.isNaN) None else Some(BigDecimal(d))
    case d: java.math.BigDecimal => Some(BigDecimal(d))
    case t: java.sql.Timestamp =>
      Some(BigDecimal(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L))
    case d: java.sql.Date => Some(BigDecimal(d.toLocalDate.toEpochDay))
    case _ => None
  }

  /** Literal values arrive as catalyst INTERNAL types. */
  private def litNum(l: Literal): Option[BigDecimal] = (l.value, l.dataType) match {
    case (null, _) => None
    case (v: Byte, _) => Some(BigDecimal(v.toInt))
    case (v: Short, _) => Some(BigDecimal(v.toInt))
    case (v: Int, DateType) => Some(BigDecimal(v)) // epoch days
    case (v: Int, _) => Some(BigDecimal(v))
    case (v: Long, _) => Some(BigDecimal(v)) // incl. timestamp micros
    case (v: Float, _) => if (v.isNaN) None else Some(BigDecimal(v.toDouble))
    case (v: Double, _) => if (v.isNaN) None else Some(BigDecimal(v))
    case (v: org.apache.spark.sql.types.Decimal, _) => Some(v.toBigDecimal)
    case _ => None
  }

  private def litStr(l: Literal): Option[String] = l.value match {
    case null => None
    case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
    case _ => None
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** A pushed conjunct → an optional per-file constraint. Anything not
    * recognized yields None (no pruning from that conjunct). */
  def constraint(e: Expression): Option[Constraint] = e match {
    case EqualTo(a, l: Literal) => point(a, Seq(l))
    case EqualTo(l: Literal, a) => point(a, Seq(l))
    case EqualNullSafe(a, l: Literal) if l.value != null => point(a, Seq(l))
    case EqualNullSafe(l: Literal, a) if l.value != null => point(a, Seq(l))
    case In(a, ls) if ls.nonEmpty && ls.forall(_.isInstanceOf[Literal]) =>
      point(a, ls.map(_.asInstanceOf[Literal]))
    case InSet(a, vs) if vs.nonEmpty =>
      // InSet carries INTERNAL values — wrap via the case-class
      // constructor (Literal.create would re-convert external forms)
      point(a, vs.toSeq.map(v => Literal(v, a.dataType)))
    case GreaterThan(a, l: Literal) => bound(a, l, lower = true, strict = true)
    case GreaterThanOrEqual(a, l: Literal) => bound(a, l, lower = true, strict = false)
    case LessThan(a, l: Literal) => bound(a, l, lower = false, strict = true)
    case LessThanOrEqual(a, l: Literal) => bound(a, l, lower = false, strict = false)
    // literal-on-the-left spellings flip the direction
    case GreaterThan(l: Literal, a) => bound(a, l, lower = false, strict = true)
    case GreaterThanOrEqual(l: Literal, a) => bound(a, l, lower = false, strict = false)
    case LessThan(l: Literal, a) => bound(a, l, lower = true, strict = true)
    case LessThanOrEqual(l: Literal, a) => bound(a, l, lower = true, strict = false)
    case _ => None
  }

  private def point(a: Expression, ls: Seq[Literal]): Option[Constraint] =
    attrName(a).flatMap { n =>
      val nums = ls.flatMap(litNum)
      val strs = ls.flatMap(litStr)
      // every non-null literal must be representable, else no pruning
      val nonNull = ls.count(_.value != null)
      if (nonNull == 0 || nums.size + strs.size != nonNull) None
      else Some(PointIn(n, nums, strs))
    }

  private def bound(a: Expression, l: Literal, lower: Boolean,
      strict: Boolean): Option[Constraint] =
    attrName(a).flatMap { n =>
      (litNum(l), litStr(l)) match {
        case (Some(b), _) => Some(Bound(n, lower, strict, Some(b), None))
        case (_, Some(s)) => Some(Bound(n, lower, strict, None, Some(s)))
        case _ => None
      }
    }
}
