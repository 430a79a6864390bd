package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Guards against driver-side fixture drift. Round 8 lost 20 oracle rows
  * because `/root/testdata` was regenerated with a different parquet
  * physical type for `events.ts` (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)) and
  * the loader silently corrupted every timestamp 1000×. These assertions
  * turn any future physical-type or value-range drift into a red test the
  * moment it happens, instead of a pile of red oracle rows at round end.
  *
  * Every fixture read in the engine goes through [[Tables]], so covering the
  * loaders here covers all downstream queries.
  */
class FixtureSanitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = TestSpark.sf0001

  test("events: ts loads as TIMESTAMP with values inside the 2024 fixture window") {
    val e = Tables.events(spark, dir)
    assert(e.schema("ts").dataType == TimestampType,
      s"events.ts must load as TIMESTAMP, got ${e.schema("ts").dataType}")
    val Row = e.agg(
      min($"ts"), max($"ts"), count(lit(1)),
      sum(when($"ts".isNull, 1).otherwise(0))).head()
    val (lo, hi, n, nulls) =
      (Row.getTimestamp(0), Row.getTimestamp(1), Row.getLong(2), Row.getLong(3))
    assert(n > 0, "events fixture is empty")
    assert(nulls == 0, "events.ts has nulls")
    // The driver generates 30 days of 2024 events; a collapsed-to-1970 or
    // exploded-to-2262 range means the loader misread the physical type.
    assert(lo.after(Timestamp.valueOf("2024-01-01 00:00:00")) || lo.equals(Timestamp.valueOf("2024-01-01 00:00:00")),
      s"events.ts min $lo before 2024-01-01 — loader likely misread the timestamp unit")
    assert(hi.before(Timestamp.valueOf("2030-01-01 00:00:00")),
      s"events.ts max $hi after 2030 — loader likely misread the timestamp unit")
    // The fixture spans weeks, not minutes: a unit error compresses the range.
    val spanDays = (hi.getTime - lo.getTime) / 86400000.0
    assert(spanDays > 1.0, s"events.ts span ${spanDays}d — collapsed range indicates a unit error")
  }

  test("events: expected columns present with non-null ids and types") {
    val e = Tables.events(spark, dir)
    val cols = e.columns.toSet
    assert(Set("event_id", "ts", "user_id", "event_type", "value", "props").subsetOf(cols),
      s"events missing columns: ${Set("event_id", "ts", "user_id", "event_type", "value", "props") -- cols}")
    val bad = e.filter($"event_id".isNull || $"user_id".isNull || $"event_type".isNull).count()
    assert(bad == 0, s"$bad events rows with null id/user/type")
  }

  test("documents/embeddings: non-empty with non-null keys") {
    val d = Tables.documents(spark, dir)
    val docBad = d.filter($"doc_id".isNull || $"text".isNull).count()
    assert(d.count() > 0 && docBad == 0, s"documents: ${d.count()} rows, $docBad null keys")
    val em = Tables.embeddings(spark, dir)
    val emBad = em.filter($"vec_id".isNull || $"embedding".isNull || size($"embedding") <= 0).count()
    assert(em.count() > 0 && emBad == 0, s"embeddings: ${em.count()} rows, $emBad null/empty vectors")
  }

  test("planted-duplicate ids (q136/q244 negative range) are disjoint from real ids at every SF") {
    // the q136/q244 fixtures plant duplicates under `-doc_id - 1`; that is
    // only collision-free if real doc_ids are non-negative — pin the
    // invariant so a regenerated fixture with negative ids turns red here,
    // not as a silent planted-vs-real collision the oracle cannot see
    // (engine and oracle would collide identically)
    for (d <- Seq(TestSpark.sf0001) ++
           Seq("/root/testdata/sf0.01").filter(p => new java.io.File(p).isDirectory)) {
      val docs = Tables.documents(spark, d)
      assert(docs.filter($"doc_id" < 0).count() == 0,
        s"$d: negative doc_ids collide with the planted-duplicate id range")
    }
  }

  test("documents: lang/source are JSON-literal-safe at every SF (q256 fixture invariant)") {
    // JsonlCorpusSource.lineExpr interpolates lang/source RAW into the
    // JSON fixture line (pinned concat so the DuckDB twin rebuilds the
    // exact bytes); a quote/backslash/control char in either field would
    // make the engine's PERMISSIVE parse mark a non-planted row corrupt
    // while the oracle's corrupt flag keys solely on doc_id % 97 — a
    // silent engine/oracle divergence. Pin the string domain instead of
    // escaping on both sides (the advisor's alternative): simpler, and a
    // regenerated fixture that violates it turns red HERE.
    for (d <- Seq(TestSpark.sf0001) ++
           Seq("/root/testdata/sf0.01").filter(p => new java.io.File(p).isDirectory)) {
      val bad = Tables.documents(spark, d)
        .filter($"lang".rlike("[\"\\\\\\x00-\\x1f]") ||
          $"source".rlike("[\"\\\\\\x00-\\x1f]"))
        .count()
      assert(bad == 0,
        s"$d: $bad documents rows with JSON-special chars in lang/source " +
          "— the q256 fixture line concat needs escaping on both sides")
    }
  }

  test("tpch tables: non-empty with non-null keys") {
    // Keys start at 0 in the driver fixture, so null-checks only.
    val li = Tables.lineitem(spark, dir)
    assert(li.count() > 0 && li.filter($"l_orderkey".isNull).count() == 0)
    val o = Tables.orders(spark, dir)
    assert(o.count() > 0 && o.filter($"o_orderkey".isNull).count() == 0)
    val c = Tables.customer(spark, dir)
    assert(c.count() > 0 && c.filter($"c_custkey".isNull).count() == 0)
    assert(Tables.nation(spark, dir).count() > 0)
    assert(Tables.region(spark, dir).count() > 0)
    assert(Tables.supplier(spark, dir).count() > 0)
    assert(Tables.part(spark, dir).count() > 0)
  }
}
