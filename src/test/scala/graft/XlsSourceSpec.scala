package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.pipelines.MatrizMovilidad
import org.apache.spark.sql.functions._

/** `.xls` (BIFF8-in-OLE2) DataSource V2 against in-test synthesized
  * fixtures — the reference's `pd.read_excel('datos_laborales.xls')`
  * input (nb c8). The fixture writer builds a real CFB container
  * (FAT or mini-stream layout, chosen by stream size, exactly as Excel
  * does at the 4096-byte cutoff) around a BIFF8 Workbook stream. */
class XlsSourceSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ BIFF writer

  private def rec(op: Int, body: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.putShort(op.toShort).putShort(body.length.toShort).put(body)
    out.array()
  }

  private def bof(docType: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(0x0600.toShort).putShort(docType.toShort)
      .putShort(0x0DBB.toShort).putShort(0x07CC.toShort).putInt(0).putInt(0)
    rec(0x0809, b.array())
  }

  /** Cells: (row, col, value); String → LABELSST, Double → NUMBER,
    * Int → RK. `padGlobals` inserts an unknown filler record so the
    * stream crosses the 4096-byte CFB mini cutoff (main-FAT layout). */
  private def biffStream(sheets: Seq[(String, Seq[(Int, Int, Any)])],
                         padGlobals: Int = 0): Array[Byte] = {
    val sstStrings = sheets.flatMap(_._2).collect { case (_, _, s: String) => s }.distinct
    val sstIndex = sstStrings.zipWithIndex.toMap

    def sheetBytes(cells: Seq[(Int, Int, Any)]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(bof(0x0010))
      cells.foreach { case (row, col, v) =>
        val head = ByteBuffer.allocate(6).order(ByteOrder.LITTLE_ENDIAN)
        head.putShort(row.toShort).putShort(col.toShort).putShort(0)
        v match {
          case s: String =>
            val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
            b.put(head.array()).putInt(sstIndex(s))
            out.write(rec(0x00FD, b.array()))
          case d: Double =>
            val b = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
            b.put(head.array()).putDouble(d)
            out.write(rec(0x0203, b.array()))
          case i: Int =>   // RK, integer encoding
            val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
            b.put(head.array()).putInt((i << 2) | 2)
            out.write(rec(0x027E, b.array()))
          case other => fail(s"unsupported fixture cell $other")
        }
      }
      out.write(rec(0x000A, Array.empty))
      out.toByteArray
    }
    val sheetBodies = sheets.map(s => sheetBytes(s._2))

    def boundsheet(name: String, pos: Int): Array[Byte] = {
      val nb = name.getBytes("ISO-8859-1")
      val b = ByteBuffer.allocate(8 + nb.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(pos).put(0.toByte).put(0.toByte)
        .put(nb.length.toByte).put(0.toByte).put(nb)
      rec(0x0085, b.array())
    }
    def sstRec: Array[Byte] = {
      val body = new ByteArrayOutputStream()
      val h = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      h.putInt(sstStrings.length).putInt(sstStrings.length)
      body.write(h.array())
      sstStrings.foreach { s =>
        val nb = s.getBytes("ISO-8859-1")
        val b = ByteBuffer.allocate(3 + nb.length).order(ByteOrder.LITTLE_ENDIAN)
        b.putShort(s.length.toShort).put(0.toByte).put(nb)
        body.write(b.array())
      }
      rec(0x00FC, body.toByteArray)
    }
    // globals need sheet BOF offsets — assemble once with zeros to
    // measure, then again with the real positions
    def globals(positions: Seq[Int]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(bof(0x0005))
      if (padGlobals > 0) out.write(rec(0x08FF, new Array[Byte](padGlobals)))
      sheets.zip(positions).foreach { case ((name, _), pos) =>
        out.write(boundsheet(name, pos))
      }
      out.write(sstRec)
      out.write(rec(0x000A, Array.empty))
      out.toByteArray
    }
    val globalsLen = globals(sheets.map(_ => 0)).length
    val positions = sheetBodies.scanLeft(globalsLen)(_ + _.length).dropRight(1)
    val out = new ByteArrayOutputStream()
    out.write(globals(positions))
    sheetBodies.foreach(out.write)
    out.toByteArray
  }

  // ------------------------------------------------------------- CFB writer

  private val Free = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD

  private def writeCfb(path: String, streamName: String, stream: Array[Byte]): Unit = {
    val mini = stream.length < 4096
    val nW = (stream.length + 511) / 512
    val nMini = (stream.length + 63) / 64
    val nContainer = (nMini * 64 + 511) / 512
    val nSectors = if (mini) 2 + 1 + nContainer else 2 + nW

    val fat = Array.fill(128)(Free)
    fat(0) = FatSect
    fat(1) = EndOfChain   // directory
    if (mini) {
      fat(2) = EndOfChain // miniFAT sector
      for (i <- 0 until nContainer)
        fat(3 + i) = if (i == nContainer - 1) EndOfChain else 3 + i + 1
    } else {
      for (i <- 0 until nW)
        fat(2 + i) = if (i == nW - 1) EndOfChain else 2 + i + 1
    }

    def dirEntry(name: String, etype: Int, child: Int, start: Int, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val nm = name.getBytes("UTF-16LE")
      b.put(nm)
      b.position(64)
      b.putShort((nm.length + 2).toShort)
      b.put(etype.toByte).put(1.toByte)   // black
      b.putInt(Free).putInt(Free).putInt(child)   // sibs none
      b.position(116)
      b.putInt(start).putInt(size).putInt(0)
      b.array()
    }

    val buf = ByteBuffer.allocate(512 + nSectors * 512).order(ByteOrder.LITTLE_ENDIAN)
    // header
    buf.putLong(0xE11AB1A1E011CFD0L)
    buf.position(24)
    buf.putShort(0x003E.toShort).putShort(0x0003.toShort)
    buf.putShort(0xFFFE.toShort)                  // byte order
    buf.putShort(9.toShort).putShort(6.toShort)   // sector / mini shifts
    buf.position(44)
    buf.putInt(1)                                 // one FAT sector
    buf.putInt(1)                                 // first directory sector
    buf.position(56)
    buf.putInt(4096)                              // mini cutoff
    buf.putInt(if (mini) 2 else EndOfChain)       // first miniFAT sector
    buf.putInt(if (mini) 1 else 0)
    buf.putInt(EndOfChain).putInt(0)              // no DIFAT chain
    buf.putInt(0)                                 // DIFAT[0] = FAT at sector 0
    for (_ <- 1 until 109) buf.putInt(Free)
    // sector 0: FAT
    fat.foreach(buf.putInt)
    // sector 1: directory (root + stream + 2 free)
    buf.put(dirEntry("Root Entry", 5, child = 1,
      start = if (mini) 3 else EndOfChain, size = if (mini) nMini * 64 else 0))
    buf.put(dirEntry(streamName, 2, child = Free,
      start = if (mini) 0 else 2, size = stream.length))
    buf.put(new Array[Byte](256))
    if (mini) {
      // sector 2: miniFAT
      val mfat = Array.fill(128)(Free)
      for (i <- 0 until nMini) mfat(i) = if (i == nMini - 1) EndOfChain else i + 1
      mfat.foreach(buf.putInt)
      // container sectors
      buf.put(java.util.Arrays.copyOf(stream, nContainer * 512))
    } else {
      buf.put(java.util.Arrays.copyOf(stream, nW * 512))
    }
    Files.write(Paths.get(path), buf.array())
  }

  private def writeXls(path: String, sheets: Seq[(String, Seq[(Int, Int, Any)])],
                       padGlobals: Int = 0): Unit =
    writeCfb(path, "Workbook", biffStream(sheets, padGlobals))

  // ------------------------------------------------------------------ tests

  test("S3 XLS reader: mini-stream CFB layout, LABELSST/NUMBER/RK decode") {
    val dir = Files.createTempDirectory("graft_xls_").toFile
    dir.deleteOnExit()
    val p = s"${dir.getPath}/datos.xls"
    writeXls(p, Seq("Hoja1" -> Seq(
      (0, 0, "Unidad territorial"), (0, 1, "tasa"), (0, 2, "total"),
      (1, 0, "Santiago"), (1, 1, 3.25), (1, 2, 2002),
      (2, 0, "Ñuñoa"), (2, 1, -1.5), (2, 2, 120))))
    val df = spark.read.format("xls").load(p)   // short name via DataSourceRegister
    assert(df.schema.fieldNames.toSeq === Seq("Unidad territorial", "tasa", "total"))
    assert(df.schema("tasa").dataType.typeName === "double")
    assert(df.schema("total").dataType.typeName === "double")
    val rows = df.orderBy("Unidad territorial")
      .as[(String, Double, Double)].collect().toSeq
    assert(rows === Seq(("Santiago", 3.25, 2002.0), ("Ñuñoa", -1.5, 120.0)))
  }

  test("S3 XLS reader: main-FAT layout (stream over the 4096 mini cutoff) + sheet option") {
    val dir = Files.createTempDirectory("graft_xls2_").toFile
    dir.deleteOnExit()
    val p = s"${dir.getPath}/grande.xls"
    writeXls(p, Seq(
      "resumen" -> Seq((0, 0, "k"), (1, 0, "x")),
      "datos" -> Seq((0, 0, "comuna"), (0, 1, "v"),
        (1, 0, "maipu"), (1, 1, 7.0))),
      padGlobals = 5000)
    val df = spark.read.format("graft.sources.XlsDataSource")
      .option("sheet", "datos").load(p)
    assert(df.as[(String, Double)].collect().toSeq === Seq(("maipu", 7.0)))
    // default = first sheet
    val first = spark.read.format("graft.sources.XlsDataSource").load(p)
    assert(first.schema.fieldNames.toSeq === Seq("k"))
  }

  test("RK decode: integer, ÷100, and float-truncated forms") {
    import graft.sources.XlsUtil.decodeRk
    assert(decodeRk((2002 << 2) | 2) === 2002.0)
    assert(decodeRk((1234 << 2) | 2 | 1) === 12.34)
    val bits = java.lang.Double.doubleToLongBits(3.5)   // low 34 bits are 0
    assert(decodeRk(((bits >>> 32).toInt & 0xFFFFFFFC)) === 3.5)
    assert(decodeRk((-8 << 2) | 2) === -8.0)
  }

  test("S3→R1 pipeline: MatrizMovilidad.laborales fed straight from the .xls") {
    val dir = Files.createTempDirectory("graft_xls3_").toFile
    dir.deleteOnExit()
    val p = s"${dir.getPath}/datos_laborales.xls"
    writeXls(p, Seq("datos" -> Seq(
      (0, 0, "Unidad territorial"), (0, 1, "Variable"), (0, 2, "2010"), (0, 3, "2011"),
      (1, 0, "Comuna"), (1, 1, " Variable"), (1, 2, "2010"), (1, 3, "2011"),
      (2, 0, "SANTIAGO "), (2, 1, "Trabajadores"), (2, 2, "100"), (2, 3, "110"),
      (3, 0, "Maipu"), (3, 1, "Trabajadores"), (3, 2, "50"), (3, 3, "55"))))
    val got = MatrizMovilidad.laboralesFromXls(spark, p)
      .orderBy("comuna", "año")
      .as[(String, Int, String)].collect().toSeq
    // header-echo row (" Variable") dropped, keys normalized, years cast
    assert(got === Seq(
      ("maipu", 2010, "50"), ("maipu", 2011, "55"),
      ("santiago", 2010, "100"), ("santiago", 2011, "110")))
  }
}
