package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

/** Selective zip-member extraction over a SEEKABLE stream using only the
  * central directory (PKWARE APPNOTE.TXT record layout): scan the archive
  * tail for the end-of-central-directory record, read the central
  * directory, and for each wanted member seek to its local header and
  * inflate just that member's bytes.
  *
  * I/O cost is O(tail + central directory + wanted members) — the point
  * is listing the worksheet names of REMOTE workbooks (two ~KB XML parts)
  * without streaming whole archives through the planner, which for a
  * directory of thousands of workbooks on an object store is the
  * difference between a few MB of ranged reads and a full-corpus copy.
  *
  * ZIP64 archives are out of scope: workbook parsing is bounded by
  * [[XlsxMini.MaxWorkbookBytes]] (64 MiB) long before any 4 GiB field
  * saturates, and a saturated size field fails the bounds check below
  * rather than mis-reading. */
object ZipCentral {

  private val EocdSig = 0x06054b50L
  private val CenSig = 0x02014b50L
  private val LocSig = 0x04034b50L

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong | (u16(b, o + 2).toLong << 16)) & 0xffffffffL

  /** Extract `wanted` member names (exact match) from a zip exposed as
    * positioned reads. `readFully(pos, buf)` must fill the whole buffer
    * from absolute offset `pos` (the Hadoop PositionedReadable contract).
    * Returns only the members found; absent names are simply missing. */
  def readEntries(len: Long, readFully: (Long, Array[Byte]) => Unit,
      wanted: Set[String]): Map[String, Array[Byte]] = {
    // EOCD = 22 fixed bytes + a comment of at most 65535 bytes at EOF
    val tailLen = math.min(len, 22L + 65535L).toInt
    if (tailLen < 22) return Map.empty
    val tail = new Array[Byte](tailLen)
    readFully(len - tailLen, tail)
    var eocd = -1
    var i = tailLen - 22
    while (i >= 0 && eocd < 0) {
      if (u32(tail, i) == EocdSig) eocd = i
      i -= 1
    }
    require(eocd >= 0, "no zip end-of-central-directory record found")
    val cdSize = u32(tail, eocd + 12)
    val cdOff = u32(tail, eocd + 16)
    require(cdSize > 0 && cdSize <= XlsxMini.MaxWorkbookBytes &&
      cdOff + cdSize <= len,
      s"central directory out of bounds (off=$cdOff size=$cdSize len=$len)")
    val cd = new Array[Byte](cdSize.toInt)
    readFully(cdOff, cd)
    val out = Map.newBuilder[String, Array[Byte]]
    var p = 0
    while (p + 46 <= cd.length && u32(cd, p) == CenSig) {
      val method = u16(cd, p + 10)
      val csize = u32(cd, p + 20)
      val usize = u32(cd, p + 24)
      val nameLen = u16(cd, p + 28)
      val extraLen = u16(cd, p + 30)
      val commentLen = u16(cd, p + 32)
      val lho = u32(cd, p + 42)
      val name = new String(cd, p + 46, nameLen, StandardCharsets.UTF_8)
      if (wanted.contains(name)) {
        require(csize <= XlsxMini.MaxWorkbookBytes &&
          usize <= XlsxMini.MaxWorkbookBytes,
          s"zip member $name over the workbook byte bound")
        out += name -> readMember(readFully, name, lho, method,
          csize.toInt, usize.toInt)
      }
      p += 46 + nameLen + extraLen + commentLen
    }
    out.result()
  }

  private def readMember(readFully: (Long, Array[Byte]) => Unit,
      name: String, lho: Long, method: Int, csize: Int,
      usize: Int): Array[Byte] = {
    // the LOCAL header carries its own name/extra lengths, which may
    // differ from the central copy — data starts after the local fields
    val lh = new Array[Byte](30)
    readFully(lho, lh)
    require(u32(lh, 0) == LocSig, s"bad local file header for $name")
    val dataOff = lho + 30 + u16(lh, 26) + u16(lh, 28)
    val comp = new Array[Byte](csize)
    readFully(dataOff, comp)
    method match {
      case 0 => comp // stored
      case 8 => // deflate (raw, no zlib wrapper)
        val inf = new Inflater(true)
        try {
          inf.setInput(comp)
          val res = new Array[Byte](usize)
          var done = 0
          while (done < usize && !inf.finished()) {
            val n = inf.inflate(res, done, usize - done)
            require(n > 0 || !inf.needsInput, s"truncated deflate in $name")
            done += n
          }
          res
        } finally inf.end()
      case m =>
        throw new IllegalStateException(s"unsupported zip method $m in $name")
    }
  }

  /** Hadoop-filesystem flavor: ranged reads over `FSDataInputStream`
    * (seekable on every supported store). */
  def readEntriesHadoop(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path,
      wanted: Set[String]): Map[String, Array[Byte]] = {
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    try readEntries(len, (pos, buf) => in.readFully(pos, buf), wanted)
    finally in.close()
  }
}
