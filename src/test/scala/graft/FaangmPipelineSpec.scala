package graft

import java.nio.file.Files
import java.time.{DayOfWeek, LocalDate}

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, KeyValue}
import graft.sources.{FinCsv, TickStore}

/** End-to-end ingest of the reference's FAANGM pricing fixture shape:
  * the actual `tests/content/faangm_201X.csv` blob is excluded from the
  * reference checkout (.MISSING_LARGE_BLOBS), so this spec synthesizes
  * a fixture in the EXACT pipeline input format — headerless
  * `asset_id,ISO date,ISO timestamp,value` rows, the input contract of
  * scripts/convert-datetimes.py whose output feeds read_csv
  * (src/btree/file.rs:591) — and drives the full reference pipeline:
  * convert+read (FinCsv.read) → key-sorted bulk load (TickStore.write =
  * `sort | write_from_iterator`, convert-csv.sh) → as-of range query
  * (BTree::query, file.rs:425), asserting against independently
  * computed expectations.
  *
  * Six names (FB/AAPL/AMZN/NFLX/GOOG/MSFT → asset 0..5), every weekday
  * of 2018 Q1, an open and a close tick per day (14:30Z / 21:00Z —
  * regular session bounds in UTC), plus T+1 after-hours corrections for
  * AAPL on each month's last weekday — the knowledge-time revision case
  * the as-of query exists for. Prices are quarter-point grids (binary-
  * exact doubles) so every expectation is an exact equality.
  */
class FaangmPipelineSpec extends SparkSpec {

  private val weekdays: Seq[LocalDate] =
    Iterator.iterate(LocalDate.of(2018, 1, 1))(_.plusDays(1))
      .takeWhile(_.isBefore(LocalDate.of(2018, 4, 1)))
      .filter(d => d.getDayOfWeek != DayOfWeek.SATURDAY && d.getDayOfWeek != DayOfWeek.SUNDAY)
      .toSeq

  private def price(asset: Int, dayIdx: Int, tick: Int): Double =
    (asset + 1) * 100.0 + dayIdx * 0.5 + tick * 0.25

  private val lastWeekdayOfMonth: Seq[LocalDate] =
    weekdays.groupBy(_.getMonthValue).values.map(_.max).toSeq.sorted

  // corrected close = close + 0.75, published next day 02:00Z
  private def correction(d: LocalDate): (String, Double) =
    (s"${d.plusDays(1)}T02:00:00", price(1, weekdays.indexOf(d), 1) + 0.75)

  private lazy val csvDir = {
    val dir = Files.createTempDirectory("faangm").toFile
    val rows = new StringBuilder
    weekdays.zipWithIndex.foreach { case (d, di) =>
      (0 until 6).foreach { a =>
        rows.append(s"$a,$d,${d}T14:30:00,${price(a, di, 0)}\n")
        rows.append(s"$a,$d,${d}T21:00:00,${price(a, di, 1)}\n")
      }
    }
    lastWeekdayOfMonth.foreach { d =>
      val (ts, v) = correction(d)
      rows.append(s"1,$d,$ts,$v\n")
    }
    Files.writeString(new java.io.File(dir, "faangm_2018q1.csv").toPath, rows.toString)
    dir
  }

  test("faangm fixture: FinCsv read applies the convert-datetimes encodings exactly") {
    val df = FinCsv.read(spark, csvDir.getAbsolutePath)
    assert(df.count() === weekdays.size * 6 * 2 + 3)
    // toIntKeys = the scripts' integer encoding: yyyymmdd int + epoch s
    val r = FinCsv.toIntKeys(df.filter(col("asset_id") === 4L))
      .orderBy(col("date_int"), col("epoch_s")).collect()
    val d0 = weekdays.head
    assert(r(0).getAs[Int]("date_int") ===
      d0.getYear * 10000 + d0.getMonthValue * 100 + d0.getDayOfMonth)
    assert(r(0).getAs[Long]("epoch_s") ===
      d0.atTime(14, 30).toEpochSecond(java.time.ZoneOffset.UTC))
    assert(r(0).getAs[Double]("value") === price(4, 0, 0))
  }

  test("faangm fixture: ingest to TickStore lands month partitions, LWW sees closes") {
    val store = Files.createTempDirectory("faangm_store").toString + "/store"
    FinCsv.ingestToTickStore(spark, csvDir.getAbsolutePath, store)
    val months = new java.io.File(store).listFiles().map(_.getName).filter(_.startsWith("date_month="))
    assert(months.toSet === Set("date_month=2018-01", "date_month=2018-02", "date_month=2018-03"))

    val panel = TickStore.read(spark, store)
    // LWW daily = close tick, except AAPL's corrected month-ends
    val lww = KeyValue.lwwDaily(panel.filter(col("asset_id") === 1L))
      .select(col("date").cast("string"), col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    weekdays.zipWithIndex.foreach { case (d, di) =>
      val expected =
        if (lastWeekdayOfMonth.contains(d)) correction(d)._2 else price(1, di, 1)
      assert(lww(d.toString) === expected, s"AAPL close on $d")
    }
  }

  test("faangm fixture: as-of range replays knowledge time across the correction") {
    val store = Files.createTempDirectory("faangm_store2").toString + "/store"
    FinCsv.ingestToTickStore(spark, csvDir.getAbsolutePath, store)
    val panel = TickStore.read(spark, store)
    val febLast = lastWeekdayOfMonth(1) // 2018-02-28
    val di = weekdays.indexOf(febLast)

    // As of Feb close: the original close is the latest knowledge
    val before = AsOf.asOfRange(panel, 1L, "2018-02-01", "2018-02-28",
      s"${febLast}T23:00:00")
      .filter(col("date") === lit(febLast.toString).cast("date"))
      .select("value").collect()
    assert(before.map(_.getDouble(0)).toSeq === Seq(price(1, di, 1)))

    // As of a week later: the T+1 correction has superseded it
    val after = AsOf.asOfRange(panel, 1L, "2018-02-01", "2018-02-28",
      "2018-03-07T00:00:00")
      .filter(col("date") === lit(febLast.toString).cast("date"))
      .select("value").collect()
    assert(after.map(_.getDouble(0)).toSeq === Seq(correction(febLast)._2))

    // Non-corrected days are identical in both snapshots; count covers
    // the full requested range
    val full = AsOf.asOfRange(panel, 1L, "2018-02-01", "2018-02-28", "2018-03-07T00:00:00")
    assert(full.count() === weekdays.count(_.getMonthValue == 2))
  }
}
