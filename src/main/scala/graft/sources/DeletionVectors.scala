package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.hadoop.fs.{FileSystem, Path}

/** Delta-protocol deletion vectors, built from the two PUBLIC specs they
  * compose (delta-io PROTOCOL.md §Deletion Vectors; the RoaringBitmap
  * interchange spec, github.com/RoaringBitmap/RoaringFormatSpec):
  *
  *   - a deletion vector is a set of row indexes (positions within one
  *     parquet data file) stored as a 64-bit "RoaringBitmapArray" in the
  *     PORTABLE serialization: magic number 1681511377 (4-byte LE), an
  *     8-byte LE count of 32-bit buckets, then each bucket's standard
  *     32-bit RoaringBitmap serialization (bucket i covers row indexes
  *     [i·2³², (i+1)·2³²));
  *   - DV FILES pack many vectors: a 1-byte format version (= 1), then
  *     per vector `[dataSize: int32 BE][data][crc32(data): int32 BE]`,
  *     where `data` is the magic+bitmap bytes above. The add action's
  *     `deletionVector` descriptor records `offset` (of the size field),
  *     `sizeInBytes` (of `data`) and `cardinality`;
  *   - descriptors name the file by a Z85-encoded UUID (`storageType`
  *     "u"): the on-disk name is `deletion_vector_<canonical uuid>.bin`
  *     under the table root.
  *
  * Both ends here are this library (no vendor jar in the sandbox), so
  * cross-implementation round-trip is untestable offline — the byte
  * layout follows the published documents, and every structural rule
  * (magic, CRC, version byte, container choice at the 4096-cardinality
  * point, multi-bucket keys) is property-tested in DeltaLiteSpec.
  *
  * Container choice mirrors the roaring spec: a bucket's 16-bit chunk
  * becomes an ARRAY container (sorted uint16 list) at cardinality ≤ 4096
  * and a BITMAP container (1024 uint64 words) above — the reader accepts
  * both; run containers are out of subset (never written, refused with a
  * clear error rather than misparsed).
  */
object DeletionVectors {

  /** Descriptor payload of an add action's `deletionVector` field. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Int, sizeInBytes: Int, cardinality: Long) {
    /** On-disk path (relative to the table root) for "u" storage. */
    def relativePath: String = storageType match {
      case "u" =>
        val uuid = uuidFromZ85(pathOrInlineDv)
        s"deletion_vector_$uuid.bin"
      case other =>
        throw new UnsupportedOperationException(
          s"DV storageType '$other' out of subset (supported: u)")
    }
  }

  // ---------------------------------------------------------------- Z85

  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Rev: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** ZeroMQ Z85: every 4 input bytes (big-endian uint32) → 5 chars. */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "Z85 input must be a multiple of 4 bytes")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      val chunk = new Array[Char](5)
      var k = 4
      while (k >= 0) { chunk(k) = Z85.charAt((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.result()
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, "Z85 input must be a multiple of 5 chars")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Rev(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      val base = i / 5 * 4
      while (k >= 0) { out(base + k) = (v & 0xff).toByte; v >>= 8; k -= 1 }
      i += 5
    }
    out
  }

  def uuidToZ85(uuid: java.util.UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    z85Encode(bb.array())
  }

  def uuidFromZ85(s: String): java.util.UUID = {
    val bb = ByteBuffer.wrap(z85Decode(s))
    new java.util.UUID(bb.getLong, bb.getLong)
  }

  // ------------------------------------------- RoaringBitmapArray bytes

  private val PortableMagic = 1681511377
  private val CookieNoRun = 12346
  private val CookieRun = 12347
  private val ArrayMaxCard = 4096

  /** Serialize sorted distinct row indexes (≥ 0) to the portable
    * RoaringBitmapArray byte form (WITHOUT the magic prefix — callers
    * frame it). Buckets are dense 0..maxBucket, empty gaps included, per
    * the portable layout. */
  def serializeBitmap(positions: Array[Long]): Array[Byte] = {
    require(positions.nonEmpty, "empty DV must not be written")
    var p = 1
    while (p < positions.length) {
      require(positions(p) > positions(p - 1), "positions must be sorted distinct")
      p += 1
    }
    val nBuckets = (positions.last >>> 32) + 1
    val bos = new ByteArrayOutputStream()
    val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    head.putLong(nBuckets)
    bos.write(head.array())
    var bucket = 0L
    var idx = 0
    while (bucket < nBuckets) {
      val start = idx
      while (idx < positions.length && (positions(idx) >>> 32) == bucket) idx += 1
      bos.write(serialize32(positions, start, idx))
      bucket += 1
    }
    bos.toByteArray
  }

  /** Standard 32-bit roaring serialization of positions[start, end)'s low
    * 32 bits (all share one high-32 bucket; may be empty for a gap). */
  private def serialize32(positions: Array[Long], start: Int, end: Int): Array[Byte] = {
    // group by 16-bit container key
    val containers = scala.collection.mutable.LinkedHashMap.empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
    var i = start
    while (i < end) {
      val low = (positions(i) & 0xffffffffL).toInt
      val key = (low >>> 16) & 0xffff
      containers.getOrElseUpdate(key, new scala.collection.mutable.ArrayBuffer[Int]) += (low & 0xffff)
      i += 1
    }
    val n = containers.size
    val headerBytes = 8 + 4 * n + 4 * n // cookie+count, desc header, offset header
    val sizes = containers.values.map { vs =>
      if (vs.length <= ArrayMaxCard) 2 * vs.length else 8192
    }.toArray
    val buf = ByteBuffer.allocate(headerBytes + sizes.sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(CookieNoRun)
    buf.putInt(n)
    containers.foreach { case (key, vs) =>
      buf.putShort(key.toShort)
      buf.putShort((vs.length - 1).toShort)
    }
    var off = headerBytes
    sizes.foreach { s => buf.putInt(off); off += s }
    containers.foreach { case (_, vs) =>
      if (vs.length <= ArrayMaxCard) vs.foreach(v => buf.putShort(v.toShort))
      else {
        val words = new Array[Long](1024)
        vs.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        words.foreach(buf.putLong)
      }
    }
    buf.array()
  }

  /** Inverse of [[serializeBitmap]]: portable bytes → sorted positions. */
  def deserializeBitmap(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val nBuckets = buf.getLong
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var bucket = 0L
    while (bucket < nBuckets) {
      deserialize32(buf).foreach(low => out += (bucket << 32) | (low & 0xffffffffL))
      bucket += 1
    }
    out.toArray
  }

  private def deserialize32(buf: ByteBuffer): Array[Int] = {
    val cookie = buf.getInt
    val (n, hasOffsets, runFlags) = (cookie & 0xffff) match {
      case CookieRun =>
        val count = (cookie >>> 16) + 1
        val flags = new Array[Byte]((count + 7) / 8)
        buf.get(flags)
        (count, count >= 4, flags) // offset header only when ≥4 containers
      case _ if cookie == CookieNoRun => (buf.getInt, true, null)
      case _ =>
        throw new IllegalArgumentException(s"bad roaring cookie $cookie")
    }
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = buf.getShort & 0xffff
      cards(i) = (buf.getShort & 0xffff) + 1
      i += 1
    }
    if (hasOffsets) { var j = 0; while (j < n) { buf.getInt; j += 1 } }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    i = 0
    while (i < n) {
      val isRun = runFlags != null && ((runFlags(i / 8) >> (i % 8)) & 1) == 1
      if (isRun)
        throw new UnsupportedOperationException(
          "roaring run containers out of subset")
      else if (cards(i) <= ArrayMaxCard) {
        var j = 0
        while (j < cards(i)) {
          out += (keys(i) << 16) | (buf.getShort & 0xffff)
          j += 1
        }
      } else {
        var w = 0
        while (w < 1024) {
          var word = buf.getLong
          while (word != 0L) {
            val t = java.lang.Long.numberOfTrailingZeros(word)
            out += (keys(i) << 16) | (w * 64 + t)
            word &= word - 1
          }
          w += 1
        }
      }
      i += 1
    }
    out.toArray
  }

  // --------------------------------------------------------- DV file IO

  /** Write one DV file holding `bitmaps.size` vectors (one per affected
    * data file, the protocol's packing) and return their descriptors in
    * input order. The file is created exclusively — DV files are
    * immutable once referenced by a commit. */
  def writeDvFile(fs: FileSystem, tableRoot: String,
      bitmaps: Seq[Array[Long]]): Seq[Descriptor] = {
    val uuid = java.util.UUID.randomUUID()
    val z = uuidToZ85(uuid)
    val path = new Path(tableRoot, s"deletion_vector_$uuid.bin")
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos) // big-endian framing
    dos.writeByte(1) // DV file format version
    val descriptors = bitmaps.map { positions =>
      val body = serializeBitmap(positions)
      val data = ByteBuffer.allocate(4 + body.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      data.putInt(PortableMagic)
      data.put(body)
      val bytes = data.array()
      val crc = new CRC32()
      crc.update(bytes)
      val offset = dos.size()
      dos.writeInt(bytes.length)
      dos.write(bytes)
      dos.writeInt(crc.getValue.toInt)
      Descriptor("u", z, offset, bytes.length, positions.length.toLong)
    }
    val out = fs.create(path, /* overwrite = */ false)
    try out.write(bos.toByteArray) finally out.close()
    descriptors
  }

  /** Read one vector back through its descriptor: seek to `offset`,
    * check the recorded size, verify the CRC and magic, deserialize. */
  def readPositions(fs: FileSystem, tableRoot: String,
      d: Descriptor): Array[Long] = {
    val path = new Path(tableRoot, d.relativePath)
    val in = fs.open(path)
    try {
      in.seek(d.offset.toLong)
      val size = in.readInt()
      require(size == d.sizeInBytes,
        s"DV size mismatch at ${d.offset}: file says $size, descriptor ${d.sizeInBytes}")
      val data = new Array[Byte](size)
      in.readFully(data)
      val storedCrc = in.readInt()
      val crc = new CRC32()
      crc.update(data)
      require(crc.getValue.toInt == storedCrc, "DV checksum mismatch")
      val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      val magic = bb.getInt
      require(magic == PortableMagic, s"bad DV magic $magic")
      val body = new Array[Byte](size - 4)
      bb.get(body)
      val positions = deserializeBitmap(body)
      require(positions.length.toLong == d.cardinality,
        s"DV cardinality mismatch: ${positions.length} vs ${d.cardinality}")
      positions
    } finally in.close()
  }
}
