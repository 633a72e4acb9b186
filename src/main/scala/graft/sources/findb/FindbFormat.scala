package graft.sources.findb

import java.io.RandomAccessFile

import org.apache.spark.sql.types._

/** Binary layout of the reference's on-disk B-tree (all integers
  * big-endian u32, values big-endian f32):
  *
  *  - file header (reference src/btree/file.rs:53-59): page_size,
  *    page_count, root_page_num — 12 bytes.
  *  - page (file.rs:92-99): header of 4 u32s (page_type 0=leaf/1=inner,
  *    num_keys, extra_page_num, unused), then `num_keys` fixed 16-byte
  *    entries: key = (asset_id, date, timestamp) u32×3 (file.rs:21-25),
  *    value = f32 for leaves / child page number for inner nodes
  *    (file.rs:128-147).
  *  - leaves are chained backwards through extra_page_num
  *    (file.rs:346-348); u32::MAX terminates the chain.
  *
  * Implemented from the format spec — no reference code is used.
  */
object FindbFormat {
  val FileHeaderSize = 12
  val PageHeaderSize = 16
  val KeyValueSize = 16
  val LeafType = 0L
  val InnerType = 1L
  val NoPage: Long = 0xFFFFFFFFL

  /** u32 fields surface as long (unsigned-safe); yyyymmdd dates fit int;
    * f32 values stay float.
    */
  val schema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("date", IntegerType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("value", FloatType, nullable = false)))

  /** [[schema]] plus a trailing `pri` column = the index of the store
    * in the reader's path list. Opt-in (`.option("withPriority",
    * true)`): it lets a multi-store merge read N stores through ONE
    * planned scan and still resolve key collisions by input priority.
    */
  val schemaWithPriority: StructType =
    schema.add(StructField("pri", IntegerType, nullable = false))

  case class Header(pageSize: Int, pageCount: Long, rootPageNum: Long)

  def readHeader(raf: RandomAccessFile): Header = {
    raf.seek(0)
    readHeaderFrom(raf)
  }

  /** 12-byte header off any positioned DataInput (RandomAccessFile for
    * local tests/patching, FSDataInputStream for cluster reads).
    * page_count and root_page_num are u32 on disk (reference
    * file.rs:53-59) and surface as Long — a signed readInt turned a
    * ≥2³¹-page store into a negative count that planned zero
    * partitions and returned an empty result instead of failing.
    */
  private def readHeaderFrom(in: java.io.DataInput): Header = {
    val pageSize = in.readInt()
    val pageCount = Integer.toUnsignedLong(in.readInt())
    val root = Integer.toUnsignedLong(in.readInt())
    Header(pageSize, pageCount, root)
  }

  def pageOffset(pageNum: Long, pageSize: Int): Long =
    FileHeaderSize + pageNum * pageSize.toLong

  // ── directory-of-parts store layout ────────────────────────────────
  // A single-file store concatenates every page behind a 12-byte
  // header. A DIRECTORY store keeps the distributed writer's part
  // files as-is — assembly is then PURE METADATA on every filesystem
  // (no HDFS `concat` capability needed, no O(store bytes) driver
  // copy): `part-NNNNN` files in name order carry the data pages, an
  // optional `top` file carries the driver's top-tree pages, and
  // `_header` is the same 12-byte header on its own. Pages are
  // absolute-addressed across the whole directory, so the file a page
  // lives in falls out of cumulative file lengths alone.
  val DirHeaderFile = "_header"
  val DirTopFile = "top"
  val DirPartPrefix = "part-"

  /** One physical file of a store: absolute pages [basePage,
    * basePage+nPages) live at byteOffset + (p − basePage)·pageSize.
    */
  case class StoreFile(path: String, basePage: Long, nPages: Long, byteOffset: Long)

  /** Resolved physical layout of a store (single-file or directory). */
  case class StoreLayout(pageSize: Int, pageCount: Long, rootPageNum: Long,
                         files: IndexedSeq[StoreFile])

  /** Resolves `path` into a [[StoreLayout]]: a directory is a
    * directory-of-parts store, anything else the single-file format.
    * Metadata-only: reads the 12-byte header plus a file listing.
    * Goes through the Hadoop FileSystem API (like the distributed
    * writer), so a store on HDFS/S3 resolves exactly like a local one
    * — java.io would chain the whole connector to the driver's disk.
    * `conf` must be the SESSION'S Hadoop conf (`spark.sessionState
    * .newHadoopConf()`), not a bare `new Configuration()`: the
    * session conf carries `spark.hadoop.*` (S3A credentials,
    * fs.defaultFS, custom fs.<scheme>.impl bindings) without which a
    * non-local store fails to authenticate or resolve its scheme.
    */
  def layout(path: String, conf: org.apache.hadoop.conf.Configuration): StoreLayout = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.getFileStatus(p).isDirectory) {
      val hin = fs.open(new org.apache.hadoop.fs.Path(p, DirHeaderFile))
      val h = try readHeaderFrom(hin) finally hin.close()
      // NUMERIC order on the part suffix, not name order: the writer
      // names parts part-%05d, and at >99999 partitions lexicographic
      // order puts part-100000 before part-99999 — base pages would
      // silently mis-assign and pruned descents would read the wrong
      // pages. Non-numeric part-* names are a corrupt store: fail.
      val parts = fs.listStatus(p)
        .filter(_.getPath.getName.startsWith(DirPartPrefix))
        .sortBy { st =>
          val sfx = st.getPath.getName.drop(DirPartPrefix.length)
          require(sfx.nonEmpty && sfx.forall(_.isDigit),
            s"store part file ${st.getPath.getName}: non-numeric suffix")
          sfx.toLong
        }
      val topPath = new org.apache.hadoop.fs.Path(p, DirTopFile)
      val top = if (fs.exists(topPath)) Seq(fs.getFileStatus(topPath)) else Seq.empty
      val files = IndexedSeq.newBuilder[StoreFile]
      var base = 0L
      (parts.toSeq ++ top).foreach { st =>
        require(st.getLen % h.pageSize == 0,
          s"store file ${st.getPath.getName} length ${st.getLen} not page-aligned")
        val n = st.getLen / h.pageSize
        // Per-FILE page counts must fit an Int: the scan's split math
        // (chunkRun's local offsets, FindbInputPartition.start/endPage)
        // is Int-indexed within one file. The STORE total (pageCount)
        // stays u32/Long — ≥2^31 pages across many part files plan
        // fine; a single ≥2^31-page file must fail loudly at plan time
        // instead of wrapping to negative page indices mid-read.
        require(n <= Int.MaxValue,
          s"store file ${st.getPath.getName}: $n pages exceeds the " +
            s"per-file Int page-index limit (split the store into parts)")
        if (n > 0) { files += StoreFile(st.getPath.toString, base, n, 0L); base += n }
      }
      require(base == h.pageCount,
        s"directory store $path: files carry $base pages, header says ${h.pageCount}")
      StoreLayout(h.pageSize, h.pageCount, h.rootPageNum, files.result())
    } else {
      val in = fs.open(p)
      val h = try readHeaderFrom(in) finally in.close()
      // Same per-file Int page-index limit as the directory branch: a
      // single-file store IS one file, so ≥2^31 pages cannot be split
      // by the Int-indexed reader — fail at plan time, not mid-read.
      require(h.pageCount <= Int.MaxValue,
        s"single-file store $path: ${h.pageCount} pages exceeds the " +
          "per-file Int page-index limit (write it as a directory store)")
      StoreLayout(h.pageSize, h.pageCount, h.rootPageNum,
        IndexedSeq(StoreFile(path, 0L, h.pageCount, FileHeaderSize.toLong)))
    }
  }

  /** Driver-side convenience: layout under the ACTIVE session's Hadoop
    * conf (tests and tools; the connector threads its own conf).
    */
  def layout(path: String): StoreLayout =
    layout(path, org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  /** Random page access over a [[StoreLayout]] (the planner's
    * inner-node descent walks pages across part files). Opens each
    * underlying file lazily, once; positioned `readFully` preads, so
    * the same object works against HDFS/S3 streams.
    */
  final class StorePages(l: StoreLayout,
      conf: org.apache.hadoop.conf.Configuration) extends AutoCloseable {
    private val ins = new Array[org.apache.hadoop.fs.FSDataInputStream](l.files.size)
    private def fileIdx(p: Long): Int = {
      var a = 0; var b = l.files.size
      while (a < b) {
        val m = (a + b) >>> 1
        if (l.files(m).basePage + l.files(m).nPages <= p) a = m + 1 else b = m
      }
      require(a < l.files.size && l.files(a).basePage <= p,
        s"page $p outside store layout")
      a
    }
    def read(p: Long, buf: Array[Byte], len: Int): Unit = {
      val i = fileIdx(p)
      val sf = l.files(i)
      if (ins(i) == null) {
        val hp = new org.apache.hadoop.fs.Path(sf.path)
        ins(i) = hp.getFileSystem(conf).open(hp)
      }
      ins(i).readFully(sf.byteOffset + (p - sf.basePage) * l.pageSize.toLong, buf, 0, len)
    }
    override def close(): Unit = ins.foreach(r => if (r != null) r.close())
  }

  def keyCapacity(pageSize: Int): Int = (pageSize - PageHeaderSize) / KeyValueSize

  def u32(buf: Array[Byte], off: Int): Long =
    ((buf(off) & 0xFFL) << 24) | ((buf(off + 1) & 0xFFL) << 16) |
      ((buf(off + 2) & 0xFFL) << 8) | (buf(off + 3) & 0xFFL)

  def f32(buf: Array[Byte], off: Int): Float =
    java.lang.Float.intBitsToFloat(u32(buf, off).toInt)

  def putU32(buf: Array[Byte], off: Int, v: Long): Unit = {
    buf(off) = ((v >>> 24) & 0xFF).toByte
    buf(off + 1) = ((v >>> 16) & 0xFF).toByte
    buf(off + 2) = ((v >>> 8) & 0xFF).toByte
    buf(off + 3) = (v & 0xFF).toByte
  }

  def putF32(buf: Array[Byte], off: Int, v: Float): Unit =
    putU32(buf, off, Integer.toUnsignedLong(java.lang.Float.floatToIntBits(v)))

  /** Builds the inner levels bottom-up over `children0` = (firstKey,
    * pageNum) per child, emitting pages with consecutive numbers from
    * `firstPage` through `emit(pageType, numKeys, extraPageNum, fill)`.
    * Returns (rootPageNum, pagesWritten). Shared by the single-process
    * and distributed writers — separator key j of an inner node is the
    * first key of child j+1, and the last child pointer overflows to
    * extra_page_num exactly when all `cap` key slots are used
    * (reference file.rs:396-403). A single child emits nothing: it IS
    * the root. Page numbers in `children0` may be any absolute values —
    * the builder is numbering-agnostic.
    */
  def writeInnerLevels(cap: Int,
      children0: IndexedSeq[((Long, Int, Long), Long)], firstPage: Long,
      emit: (Long, Int, Long, Array[Byte] => Unit) => Unit): (Long, Long) = {
    require(children0.nonEmpty, "writeInnerLevels needs at least one child")
    var pageNum = firstPage
    var level = children0
    while (level.size > 1) {
      val parents = level.grouped(cap + 1).toIndexedSeq
      level = parents.map { children =>
        val myPage = pageNum
        // Row j of an inner page carries separator key j (= first key
        // of child j+1) and, in its value slot, the pointer to child j.
        val nKeys = children.size - 1
        val extra = if (nKeys == cap) children.last._2 else NoPage
        emit(InnerType, nKeys, extra, { buf =>
          var j = 0
          while (j < nKeys) { // separator keys from children 1..n
            val ((a, d, t), _) = children(j + 1)
            val off = PageHeaderSize + j * KeyValueSize
            putU32(buf, off, a); putU32(buf, off + 4, d.toLong); putU32(buf, off + 8, t)
            j += 1
          }
          val inSlots = if (nKeys == cap) children.size - 1 else children.size
          j = 0
          while (j < inSlots) { // child pointers in value slots 0..
            putU32(buf, PageHeaderSize + j * KeyValueSize + 12, children(j)._2)
            j += 1
          }
        })
        pageNum += 1
        (children.head._1, myPage)
      }
    }
    (level.head._2, pageNum - firstPage)
  }
}

/** Bulk writer: key-sorted entries → a format-valid B-tree file
  * (`write_from_iterator` analog, reference file.rs:296). Layout: leaf
  * pages first (backward-chained), then inner levels bottom-up, root
  * last; separator key i of an inner node is the first key of child
  * i+1. Structurally valid for any descending reader; graft's own scan
  * walks leaves only.
  */
object FindbWriter {
  import FindbFormat._

  /** entry = (asset_id, dateInt, timestamp, value); must be key-sorted. */
  def write(path: String, pageSize: Int, entries: Seq[(Long, Int, Long, Float)]): Unit = {
    val cap = keyCapacity(pageSize)
    require(cap >= 2, s"page size $pageSize too small")
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    try {
      val leaves = entries.grouped(cap).toIndexedSeq
      val pageBuf = new Array[Byte](pageSize)

      def writePage(pageType: Long, numKeys: Int, extra: Long)(fill: Array[Byte] => Unit): Unit = {
        java.util.Arrays.fill(pageBuf, 0.toByte)
        putU32(pageBuf, 0, pageType)
        putU32(pageBuf, 4, numKeys.toLong)
        putU32(pageBuf, 8, extra)
        fill(pageBuf)
        out.write(pageBuf)
      }

      // header placeholder
      out.writeInt(pageSize); out.writeInt(0); out.writeInt(0)

      // leaves, backward-chained
      leaves.zipWithIndex.foreach { case (chunk, i) =>
        writePage(LeafType, chunk.size, if (i == 0) NoPage else (i - 1).toLong) { buf =>
          chunk.zipWithIndex.foreach { case ((a, d, t, v), j) =>
            val off = PageHeaderSize + j * KeyValueSize
            putU32(buf, off, a); putU32(buf, off + 4, d.toLong)
            putU32(buf, off + 8, t); putF32(buf, off + 12, v)
          }
        }
      }

      // inner levels bottom-up via the shared builder: children of
      // level L become entries of L+1 ((firstKey, pageNum) per child)
      val level0: IndexedSeq[((Long, Int, Long), Long)] =
        leaves.zipWithIndex.map { case (chunk, i) =>
          val (a, d, t, _) = chunk.head
          ((a, d, t), i.toLong)
        }
      val (root, innerPages) = writeInnerLevels(cap, level0, leaves.size.toLong,
        (pt, nk, ex, fill) => writePage(pt, nk, ex)(fill))
      val pageCount = leaves.size.toLong + innerPages
      require(pageCount <= 0xFFFFFFFFL, s"page count $pageCount outside u32")
      out.flush()
      // patch header with page_count and root
      val raf = new RandomAccessFile(path, "rw")
      try {
        raf.seek(4); raf.writeInt(pageCount.toInt)
        raf.writeInt(root.toInt)
      } finally raf.close()
    } finally out.close()
  }
}
