package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.sys.process.{Process, ProcessLogger}

import graft.sources.findb.{FindbDistWriter, FindbWriter}

/** Cross-IMPLEMENTATION byte interop with the actual reference binary
  * (r11 VERDICT item 3): builds the reference Rust crate with cargo,
  * then proves BOTH directions of the format contract —
  *
  *   - a store the REFERENCE's `write_from_iterator` produced reads
  *     back byte-exactly through the A10 connector (full scan AND a
  *     pruned In(asset_id) descent);
  *   - stores OUR writers produced ([[FindbWriter]] and the
  *     distributed [[FindbDistWriter]] in single-file mode) answer the
  *     reference's own `BTree::query` with the reference's documented
  *     as-of semantics, identically to the reference querying its own
  *     store over the same rows.
  *
  * Gated on toolchain availability (`cargo` on PATH): the suite cancels
  * — not passes — when the reference can't be built.
  *
  * The reference is built from a PATCHED COPY under /tmp (never in
  * place): itertools (a test-only dep, unfetchable offline) is
  * dropped along with mem.rs's test module; `QueryResultIterator::next`
  * and `BTree::print` are made pub plus a csv accessor (the crate's
  * main.rs is 100% commented out, so no public driver exists); and
  * cache.rs gets a ONE-LINE bug fix this spec exists to document:
  * `page_from_slot` (reference cache.rs:121) computes the file offset
  * from the CLOCK SLOT number instead of the page number, so any
  * out-of-order page load — e.g. a cold-cache root descent, root being
  * the LAST page — reads the wrong page and silently returns wrong
  * rows. The reference's own test_small masks it by `print()`ing all
  * pages in order (slot i == page i) into an oversized cache before
  * querying; query results below are checked against file.rs's own
  * test expectations, so the patched build demonstrably preserves the
  * reference's intended semantics.
  *
  * Second latent reference defect, found driving this gate and NOT
  * patched (it bounds the test envelope instead): `write_from_iterator`
  * mis-links inner levels once lineage[0] overflows (> cap+1 leaves →
  * ≥ 2 inner levels) — the replacement node created in `add_to_parent`
  * (file.rs:396) never receives its first child pointer, and the
  * final-flush loop (file.rs:354) stamps every open level with the
  * LAST leaf's first key — so the reference querying its OWN ≥3-level
  * store returns silently truncated results (reproduced: 288 rows at
  * cap 3 → query loses every date after the mis-descended leaf). The
  * leaf chain itself stays intact, which is why the A10 full scan
  * (leaf-chain based, inner-agnostic) reads such stores correctly
  * anyway. Reference-written stores are therefore generated INSIDE the
  * proven envelope (≤ cap+1 leaves: single, correctly-built inner
  * node — the final-flush path appends the last separator correctly
  * there); graft-written stores are tested DEEP (cap 3, 5 levels),
  * which the reference query handles perfectly — evidence the graft
  * writers' inner layout is what the reference descent semantics
  * intend, independent of the reference writer's own depth bug.
  */
class RustInteropSpec extends SparkSpec {

  private val refSrc = "/root/reference"
  private val buildRoot = Paths.get("/tmp/graft_findb_interop")

  private def haveCargo: Boolean =
    scala.util.Try(Process(Seq("cargo", "--version")).!!).isSuccess &&
      Files.isDirectory(Paths.get(refSrc, "src"))

  /** Copies + patches the reference crate, writes the harness crate,
    * builds both offline. Every patch anchors on exact upstream text so
    * reference drift fails loudly instead of building something else.
    */
  private lazy val harnessBin: String = {
    val refDir = buildRoot.resolve("findb-ref")
    val harDir = buildRoot.resolve("harness")
    def copy(from: Path, to: Path): Unit = {
      Files.createDirectories(to.getParent)
      Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
    }
    Seq("btree/file.rs", "btree/mem.rs", "btree/cache.rs", "btree.rs", "lib.rs")
      .foreach(f => copy(Paths.get(refSrc, "src", f), refDir.resolve(s"src/$f")))
    // drop the test-only itertools dep (offline build; mem.rs's test
    // module — its only consumer — is truncated below)
    import scala.jdk.CollectionConverters._
    val cargoToml = Files.readAllLines(Paths.get(refSrc, "Cargo.toml")).asScala
    Files.write(refDir.resolve("Cargo.toml"),
      cargoToml.filterNot(_.contains("itertools")).mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    def patch(file: String, subs: (String, String)*): Unit = {
      val p = refDir.resolve(s"src/$file")
      var txt = new String(Files.readAllBytes(p), "UTF-8")
      subs.foreach { case (from, to) =>
        assert(txt.contains(from), s"reference drift: $file no longer contains <$from>")
        txt = txt.replace(from, to)
      }
      Files.write(p, txt.getBytes("UTF-8"))
    }
    // mem.rs: keep the lib, drop the itertools-using test module
    patch("btree/mem.rs", "#[cfg(test)]" -> "#[cfg(any())] // tests dropped: itertools unavailable offline\n#[cfg(test)]")
    // file.rs: public iteration + a field accessor (fields are private)
    patch("btree/file.rs",
      "    fn next(&mut self)" -> "    pub fn next(&mut self)",
      "    fn print(&mut self) -> std::io::Result<()> {" ->
        "    pub fn print(&mut self) -> std::io::Result<()> {")
    Files.write(refDir.resolve("src/btree/file.rs"),
      ("\n\n// ── appended by graft's RustInteropSpec (fields are crate-private;\n" +
        "// this accessor exists only in the throwaway interop build) ──\n" +
        "impl QueryResult {\n" +
        "    pub fn csv_line(&self) -> String {\n" +
        "        format!(\"{},{},{},{},{}\",\n" +
        "            self.id, self.key.asset_id, self.key.date, self.key.timestamp, self.value)\n" +
        "    }\n}\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    // cache.rs: the offset-from-slot bug fix (see class doc)
    patch("btree/cache.rs",
      "self.page_from_slot(num, false)" -> "self.page_from_slot(num, 0, false)",
      "self.page_from_slot(slot_number, true)" ->
        "self.page_from_slot(slot_number, page_number, true)",
      "fn page_from_slot(&mut self, slot_number: usize, read: bool)" ->
        "fn page_from_slot(&mut self, slot_number: usize, page_number: usize, read: bool)",
      "let offset = (page_start as u64) + self.header_bytes;" ->
        "let offset = (page_number * self.page_size) as u64 + self.header_bytes;")
    // harness crate over the patched reference
    Files.createDirectories(harDir.resolve("src"))
    copy(Paths.get("src/test/resources/findb-interop/main.rs"),
      harDir.resolve("src/main.rs"))
    Files.write(harDir.resolve("Cargo.toml"),
      ("[package]\nname = \"graft-interop\"\nversion = \"0.1.0\"\nedition = \"2018\"\n\n" +
        "[dependencies]\nfindb = { path = \"../findb-ref\" }\n").getBytes("UTF-8"))
    val log = new StringBuilder
    val pl = ProcessLogger(s => log.append(s).append('\n'), s => log.append(s).append('\n'))
    val rc = Process(Seq("cargo", "build", "--release", "--offline"),
      harDir.toFile, "CARGO_NET_OFFLINE" -> "true").!(pl)
    assert(rc == 0, s"cargo build failed:\n$log")
    // the patched reference must still pass ITS OWN file.rs test
    val rcT = Process(Seq("cargo", "test", "--release", "--offline", "test_small"),
      refDir.toFile, "CARGO_NET_OFFLINE" -> "true").!(pl)
    assert(rcT == 0, s"patched reference fails its own test_small:\n$log")
    harDir.resolve("target/release/graft-interop").toString
  }

  private def run(args: String*): Seq[String] = {
    val out = new StringBuilder
    val rc = Process(harnessBin +: args).!(
      ProcessLogger(s => out.append(s).append('\n'), _ => ()))
    assert(rc == 0, s"harness ${args.head} failed")
    out.toString.linesIterator.toSeq.filter(_.contains(","))
  }

  // deterministic irregular panel: assets 0..11, dates 20240101..10,
  // ts {3,7,12}, ~20% of slots skipped, values exact in f32
  private val entries: Seq[(Long, Int, Long, Float)] = (for {
    a <- 0L until 12L
    d <- 1 to 10
    t <- Seq(3L, 7L, 12L)
    if (a + d + t) % 5 != 0
  } yield (a, 20240100 + d, t, (a * 10000 + d * 10 + t) * 0.25f)).sorted

  private val queries = Seq(
    (0L, 20240101, 20240110, 7L),
    (5L, 20240103, 20240107, 12L),
    (11L, 20240101, 20240110, 3L),
    (7L, 20240105, 20240105, 6L),
    (3L, 20240111, 20240120, 12L)) // empty range

  /** The reference's documented as-of semantics (file.rs:425-470 +
    * QueryResultIterator): per date in [sd, ed], the max-timestamp row
    * with ts ≤ qts, emitted in DESCENDING date order.
    */
  private def expected(a: Long, sd: Int, ed: Int, qts: Long): Seq[(Long, Int, Long, Float)] =
    entries.filter(e => e._1 == a && e._2 >= sd && e._2 <= ed && e._3 <= qts)
      .groupBy(_._2).map { case (_, g) => g.maxBy(_._3) }.toSeq
      .sortBy(-_._2)

  /** Parse a harness `id,asset,date,ts,value` line; value via
    * `toFloat` (Rust prints the shortest f32 round-trip repr, so the
    * parse is bit-exact — string compare would trip on `1` vs `1.0`).
    */
  private def parse(lines: Seq[String]): Seq[(Long, Int, Long, Float)] =
    lines.map { l =>
      val f = l.split(",")
      (f(1).toLong, f(2).toInt, f(3).toLong, f(4).toFloat)
    }

  private def csvOf(rows: Seq[(Long, Int, Long, Float)], dir: Path): String = {
    val f = dir.resolve("panel.csv")
    Files.write(f, rows.map(e => s"${e._1},${e._2},${e._3},${e._4}")
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    f.toString
  }

  test("A10 connector reads a store the reference binary wrote (full + pruned)") {
    if (!haveCargo) cancel("cargo/reference unavailable — interop gate skipped")
    val dir = Files.createTempDirectory("interop_refw")
    val refDb = dir.resolve("ref.db").toString
    // cap 31 → 10 leaves, single inner: inside the reference writer's
    // proven envelope (see class doc on its ≥3-level bug)
    run("write", refDb, csvOf(entries, dir), "512")
    val back = spark.read.format("graft.sources.findb.FindbDataSource")
      .option("pagesPerPartition", 4).load(refDb)
      .orderBy("asset_id", "date", "timestamp").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getFloat(3)))
    assert(back.toSeq === entries)
    // pruned read: the plan-time descent walks the REFERENCE's inner
    // pages (separator semantics must agree, not just leaf layout)
    val pruned = spark.read.format("graft.sources.findb.FindbDataSource")
      .option("pagesPerPartition", 4).load(refDb)
      .where(org.apache.spark.sql.functions.col("asset_id").isin(2L, 9L))
      .orderBy("asset_id", "date", "timestamp").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getFloat(3)))
    assert(pruned.toSeq === entries.filter(e => e._1 == 2L || e._1 == 9L))
  }

  test("reference binary queries OUR stores identically to its own") {
    if (!haveCargo) cancel("cargo/reference unavailable — interop gate skipped")
    val dir = Files.createTempDirectory("interop_ourw")
    val refDb = dir.resolve("ref.db").toString
    run("write", refDb, csvOf(entries, dir), "512") // its proven envelope
    // OUR stores go DEEP (cap 3 → 5 levels): the reference query must
    // descend graft-written inner levels its own writer can't build
    val oursDb = dir.resolve("ours.db").toString
    FindbWriter.write(oursDb, 64, entries)
    val distDb = dir.resolve("dist.db").toString
    import spark.implicits._
    FindbDistWriter.write(
      entries.toDF("asset_id", "date", "timestamp", "value"),
      distDb, pageSize = 64, numPartitions = 4) // single-file mode
    for ((a, sd, ed, qts) <- queries) {
      val want = expected(a, sd, ed, qts)
      val viaRef = parse(run("query", refDb, s"$a", s"$sd", s"$ed", s"$qts"))
      val viaOurs = parse(run("query", oursDb, s"$a", s"$sd", s"$ed", s"$qts"))
      val viaDist = parse(run("query", distDb, s"$a", s"$sd", s"$ed", s"$qts"))
      assert(viaRef === want, s"reference store, query ($a,$sd,$ed,$qts)")
      assert(viaOurs === want, s"FindbWriter store, query ($a,$sd,$ed,$qts)")
      assert(viaDist === want, s"FindbDistWriter store, query ($a,$sd,$ed,$qts)")
    }
  }
}
