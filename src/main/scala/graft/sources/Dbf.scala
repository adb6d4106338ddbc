package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S8: dBase (DBF) reader — the reference ingests vendor market data
  * in this format (src/core/sis_dbf.h:13-40: header, 32-byte field
  * descriptors, fixed-width ASCII records).
  *
  * Shape: the header (field layout) is read driver-side from one
  * file; record parsing distributes via the `binaryFile` source with
  * one task per file — vendor DBFs are per-day, per-market files, so
  * file-level parallelism is the natural partitioning (and a single
  * file is bounded by the format's 32-bit record count).
  *
  * Types: C → string, N/F (decimals>0) → double, N (no decimals) →
  * long, D → yyyymmdd int, L → boolean.
  */
object Dbf {

  final case class DbfField(name: String, ftype: Char, len: Int, dec: Int)

  final case class DbfHeader(recordCount: Int, headerSize: Int,
      recordSize: Int, fields: Seq[DbfField])

  def parseHeader(bytes: Array[Byte]): DbfHeader = {
    def u8(i: Int) = bytes(i) & 0xFF
    val recordCount = u8(4) | (u8(5) << 8) | (u8(6) << 16) | (u8(7) << 24)
    val headerSize = u8(8) | (u8(9) << 8)
    val recordSize = u8(10) | (u8(11) << 8)
    val fields = Iterator.from(0)
      .map(i => 32 + i * 32)
      .takeWhile(off => off < headerSize - 1 && u8(off) != 0x0D)
      .map { off =>
        val nameEnd = (off until off + 11).find(bytes(_) == 0).getOrElse(off + 11)
        DbfField(
          new String(bytes, off, nameEnd - off, "ASCII").trim,
          (bytes(off + 11) & 0xFF).toChar,
          u8(off + 16), u8(off + 17))
      }.toSeq
    DbfHeader(recordCount, headerSize, recordSize, fields)
  }

  private def sparkType(f: DbfField): DataType = f.ftype match {
    case 'C' => StringType
    case 'N' | 'F' => if (f.dec > 0) DoubleType else LongType
    case 'D' => IntegerType
    case 'L' => BooleanType
    case _ => StringType
  }

  def schemaOf(h: DbfHeader): StructType =
    StructType(h.fields.map(f => StructField(f.name, sparkType(f))))

  /** Parse every active record of one file's bytes. */
  def parseRecords(bytes: Array[Byte], h: DbfHeader): Iterator[Row] = {
    Iterator.range(0, h.recordCount).flatMap { r =>
      val off = h.headerSize + r * h.recordSize
      if (off + h.recordSize > bytes.length) None
      else if (bytes(off) == '*') None // deleted
      else {
        var pos = off + 1 // skip deletion flag
        val vals = h.fields.map { f =>
          val raw = new String(bytes, pos, f.len, "ASCII").trim
          pos += f.len
          f.ftype match {
            case 'C' => raw
            case 'N' | 'F' =>
              if (raw.isEmpty) null
              else if (f.dec > 0) java.lang.Double.valueOf(raw)
              else java.lang.Long.valueOf(raw)
            case 'D' => if (raw.isEmpty) null else Integer.valueOf(raw)
            case 'L' => // blank/'?' is dBase's uninitialized logical → null
              if (raw.isEmpty || raw == "?") null
              else java.lang.Boolean.valueOf(
                raw.equalsIgnoreCase("T") || raw.equalsIgnoreCase("Y"))
            case _ => raw
          }
        }
        Some(Row.fromSeq(vals))
      }
    }
  }

  /** Read DBF file(s) as a DataFrame (glob accepted). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    val first = files.limit(1).collect()
    require(first.nonEmpty, s"no DBF files at $path")
    val header = parseHeader(first(0).getAs[Array[Byte]]("content"))
    val schema = schemaOf(header)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    files.select("content").mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](0)
        parseRecords(bytes, parseHeader(bytes))
      }
    }(enc)
  }

  /** Serialize one partition's rows to DBF bytes (header + fixed-width
    * ASCII records). DBF is a bounded format (32-bit record count,
    * 16-bit record size), so per-partition in-memory assembly is the
    * natural sink shape — one vendor-day file per partition. */
  def serialize(fields: Seq[DbfField], rows: Iterator[Row]): Array[Byte] = {
    // format hard limits up front — the header encodes these as int16 /
    // uint8, so larger values would WRAP silently, not fail
    fields.foreach { f =>
      require(f.len > 0 && f.len <= 255,
        s"DBF field ${f.name}: len ${f.len} outside the format's 8-bit limit")
      require(f.dec >= 0 && f.dec <= 255,
        s"DBF field ${f.name}: dec ${f.dec} outside the format's 8-bit limit")
    }
    val recordSize = 1 + fields.map(_.len).sum
    require(recordSize <= 32767,
      s"DBF record size $recordSize exceeds the format's 16-bit limit")
    val headerSize = 32 + fields.size * 32 + 1
    require(headerSize <= 32767,
      s"DBF header size $headerSize (too many fields) exceeds 16 bits")
    val recs = rows.map { r =>
      val sb = new java.lang.StringBuilder(recordSize)
      sb.append(' ')
      fields.zipWithIndex.foreach { case (f, i) =>
        val s =
          if (r.isNullAt(i)) (if (f.ftype == 'L') "?" else "")
          else f.ftype match {
            case 'N' | 'F' if f.dec > 0 =>
              String.format(java.util.Locale.ROOT, s"%.${f.dec}f",
                java.lang.Double.valueOf(r.get(i).toString.toDouble))
            case 'L' => // dBase logical is a single T/F byte
              if (r.get(i).toString.toBoolean) "T" else "F"
            case _ => r.get(i).toString
          }
        // an over-wide NUMERIC must fail, not keep its leftmost digits
        // (silent magnitude corruption); over-wide text truncates like
        // every dBase writer does
        if (s.length > f.len && (f.ftype == 'N' || f.ftype == 'F'))
          throw new IllegalArgumentException(
            s"DBF field ${f.name}: value '$s' wider than ${f.len} chars")
        val cut = if (s.length > f.len) s.substring(0, f.len) else s
        if (f.ftype == 'C') { // left-justified text
          sb.append(cut)
          (cut.length until f.len).foreach(_ => sb.append(' '))
        } else { // right-justified numerics
          (cut.length until f.len).foreach(_ => sb.append(' '))
          sb.append(cut)
        }
      }
      sb.toString
    }.toSeq
    val buf = java.nio.ByteBuffer
      .allocate(headerSize + recs.size * recordSize + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte).put(24.toByte).put(1.toByte).put(1.toByte)
    buf.putInt(recs.size)
    buf.putShort(headerSize.toShort).putShort(recordSize.toShort)
    (12 until 32).foreach(_ => buf.put(0.toByte))
    fields.foreach { f =>
      val nb = f.name.getBytes("ASCII")
      require(nb.length <= 11, s"DBF field name too long: ${f.name}")
      buf.put(nb); (nb.length until 11).foreach(_ => buf.put(0.toByte))
      buf.put(f.ftype.toByte)
      (0 until 4).foreach(_ => buf.put(0.toByte))
      buf.put(f.len.toByte).put(f.dec.toByte)
      (0 until 14).foreach(_ => buf.put(0.toByte))
    }
    buf.put(0x0D.toByte)
    recs.foreach(r => buf.put(r.getBytes("ASCII")))
    buf.put(0x1A.toByte)
    buf.array()
  }

  /** DBF sink: one `part-N.dbf` per partition, written executor-side
    * through the Hadoop FS API (no driver collect — each task streams
    * only its own bounded file). */
  def write(df: DataFrame, fields: Seq[DbfField], dir: String): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(conf).delete(dirPath, true) // overwrite semantics
    val confSer = new org.apache.spark.util.SerializableConfiguration(conf)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.hasNext) {
        val bytes = serialize(fields, rows)
        val fin = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.dbf")
        // task-attempt temp + rename-on-success: a speculative sibling
        // or a task killed mid-write can never leave a truncated final
        // file — whoever renames last wins with a complete file
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new org.apache.hadoop.fs.Path(
          dir, f".part-$pid%05d-attempt-$attempt.dbf.tmp")
        val fs = fin.getFileSystem(confSer.value)
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        // rename WITHOUT pre-deleting the destination: a zombie attempt
        // that deleted the winner's committed file and then died would
        // leave no output at all. Rename onto an existing file fails —
        // and a failed rename whose destination already holds a
        // complete (non-empty) file IS success: a sibling attempt of
        // this same task committed identical bytes first.
        if (!fs.rename(tmp, fin)) {
          fs.delete(tmp, false)
          val committedBySibling =
            try fs.getFileStatus(fin).getLen > 0
            catch { case _: java.io.FileNotFoundException => false }
          if (!committedBySibling)
            throw new java.io.IOException(s"could not commit $fin")
        }
      }
      Iterator.empty[Int]
    }.count(): Unit
  }
}
