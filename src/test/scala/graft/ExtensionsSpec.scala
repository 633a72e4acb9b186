package graft

class ExtensionsSpec extends SparkSpec {

  test("kernel expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val dot = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot === 11.0)

    val sig = spark.sql("SELECT minhash_sig('abcdefgh', 2, 16) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length === 16)
    // signature of identical text is identical; of different text differs
    val sig2 = spark.sql("SELECT minhash_sig('abcdefgh', 2, 16) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig === sig2)

    val norm = spark.sql("SELECT l2_normalize(array(3.0D, 4.0D)) AS v")
      .collect()(0).getSeq[Double](0)
    assert(norm === Seq(0.6, 0.8))
    assert(spark.sql("SELECT l2_normalize(array(0.0D, 0.0D)) AS v").collect()(0).isNullAt(0))
    // null ELEMENTS poison the whole vector (never silently treated as 0)
    assert(spark.sql("SELECT l2_normalize(array(3.0D, CAST(NULL AS DOUBLE))) AS v")
      .collect()(0).isNullAt(0))

    val sh = spark.sql("SELECT shingle_set('abcab', 3) AS s")
      .collect()(0).getSeq[String](0)
    assert(sh === Seq("abc", "bca", "cab"))

    val ts = spark.sql("SELECT text_stats('the cat and dog!') AS t").collect()(0)
      .getStruct(0)
    assert(ts.getAs[Long]("len") === 16L && ts.getAs[Long]("n_punct") === 1L)
    assert(ts.getAs[String]("lang_guess") === "en")

    val b1 = spark.sql("SELECT lsh_bucket(array(1.0D, 2.0D), 8) AS b").collect()(0).getLong(0)
    val b2 = spark.sql("SELECT lsh_bucket(array(2.0D, 4.0D), 8) AS b").collect()(0).getLong(0)
    assert(b1 === b2) // scale-invariant

    val fp = spark.sql("SELECT simhash64('hello world hello') AS f").collect()(0).getLong(0)
    val fpSame = spark.sql("SELECT simhash64('hello world hello') AS f").collect()(0).getLong(0)
    assert(fp === fpSame)
    val fpOther = spark.sql("SELECT simhash64('completely different text entirely') AS f")
      .collect()(0).getLong(0)
    assert(fp !== fpOther)

    val q = spark.sql("SELECT quantize_int8(array(1.0D, -0.5D, 0.0D)) AS q")
      .collect()(0).getSeq[Long](0)
    assert(q === Seq(127L, -63L, 0L)) // floor(-63.5): round-half-up toward +inf on negatives

    val idot = spark.sql(
      "SELECT vec_dot_long(quantize_int8(array(1.0D, 0.0D)), quantize_int8(array(1.0D, 0.0D))) AS d")
      .collect()(0).getLong(0)
    assert(idot === 16129L)

    val wfp = spark.sql("SELECT winnow_fp('abcabcabcabc', 3, 2) AS w").collect()(0).getSeq[Long](0)
    val wfpSame = spark.sql("SELECT winnow_fp('abcabcabcabc', 3, 2) AS w").collect()(0).getSeq[Long](0)
    assert(wfp === wfpSame && wfp.nonEmpty)

    val fold = spark.sql("SELECT seq_fold(array(1.0D, 2.0D, 3.0D), 'sum') AS s")
      .collect()(0).getDouble(0)
    assert(fold === 6.0)
    val horner = spark.sql("SELECT seq_fold(array(1.0D, 1.0D), 'horner', 0.5D) AS h")
      .collect()(0).getDouble(0)
    assert(horner === 1.5) // 0*0.5+1 → 1*0.5+1
  }

  test("GraftSession factory wires extensions and tuning") {
    // a second SparkSession can't be built in this JVM (shared context),
    // so assert the builder wiring + that tune() applied to the live one
    val s = GraftSession.create(master = "local[4]")
    assert(s.conf.get("spark.sql.objectHashAggregate.sortBased.fallbackThreshold") === "131072")
    // the extension class the builder names must be constructible
    assert(new GraftExtensions() != null)
  }

  test("GraftExtensions injects the same functions via the extension point") {
    // The extension class is exercised directly (a second SparkSession
    // with spark.sql.extensions can't be built inside one test JVM).
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // registration above + SQL round-trip in the previous test covers
    // builder correctness; here we assert the extension wires every kernel.
    assert(GraftFunctions.all.map(_._1.funcName).toSet ===
      Set("vec_dot", "minhash_sig", "simhash64", "l2_normalize", "shingle_set", "lsh_bucket",
        "text_stats", "winnow_fp", "quantize_int8", "vec_dot_long", "seq_fold",
        "portable_str_hash", "char_entropy_micro"))
  }
}
