package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

/** PUFFIN — Iceberg's statistics/index file format, implemented against
  * the PUBLIC spec (iceberg.apache.org/puffin-spec/), jar-free like the
  * rest of IcebergLite. Why the format exists at 100 TB: table-level
  * statistics (NDV sketches, secondary indexes) must live OUTSIDE the
  * data path — recomputing a distinct count means a full scan of the
  * table, while a Puffin blob is a few KB read once at plan time. The
  * file is a dumb byte container with a self-describing JSON footer:
  *
  * {{{
  *   Magic Blob₁ … Blobₙ Footer
  *   Footer = Magic FooterPayload FooterPayloadSize(4, LE) Flags(4) Magic
  * }}}
  *
  * FooterPayload is UTF-8 JSON (`FileMetadata`: a `blobs` list + file
  * `properties`); each BlobMetadata records type, the schema FIELD IDS
  * the blob covers, the snapshot/sequence it was computed at, and its
  * byte `offset`/`length` in the file — so a reader seeks straight to
  * the blobs it wants. Subset stated: payload compression is not
  * written (Flags bit 0 = 0) and REFUSED on read rather than guessed;
  * blob-level `compression-codec` is likewise absent.
  *
  * Reference behavior anchor: the reference never materializes table
  * statistics at all — every BigQuery MERGE replans from raw row counts
  * (`Sites/DataProc_Script/spark_ingest_slmandicprd.py:99-103`); this
  * layer is what replaces that rescan habit at lake scale. */
object Puffin {

  private val mapper = new ObjectMapper()

  /** "PFA1" — the spec's magic, at file start and twice in the footer. */
  val Magic: Array[Byte] = Array(0x50.toByte, 0x46.toByte, 0x41.toByte, 0x31.toByte)

  /** One blob's metadata, as it appears in the footer's `blobs` list.
    * `fields` are Iceberg schema field ids (NOT names — names rename,
    * ids are forever). */
  final case class BlobMeta(blobType: String, fields: Seq[Int],
      snapshotId: Long, sequenceNumber: Long, offset: Long, length: Long,
      properties: Map[String, String])

  /** A written file: its full bytes plus the footer size the Iceberg
    * table metadata records (`file-footer-size-in-bytes`). */
  final case class Written(bytes: Array[Byte], footerSize: Long,
      blobs: Seq[BlobMeta])

  /** Serialize blobs into a Puffin file. Offsets/lengths are assigned
    * here — callers hand (type, fields, snapshot, sequence, properties,
    * payload) and get back the exact BlobMeta list the table metadata
    * must carry (the spec duplicates blob metadata in BOTH places so a
    * planner can choose blobs without opening the file). */
  def write(
      blobs: Seq[(String, Seq[Int], Long, Long, Map[String, String], Array[Byte])],
      fileProps: Map[String, String]): Written = {
    var offset = Magic.length.toLong
    val metas = blobs.map { case (tpe, fields, sid, seq, props, payload) =>
      val m = BlobMeta(tpe, fields, sid, seq, offset, payload.length.toLong, props)
      offset += payload.length
      m
    }
    val root = mapper.createObjectNode()
    val arr = root.putArray("blobs")
    metas.foreach { m =>
      val b = arr.addObject()
      b.put("type", m.blobType)
      val f = b.putArray("fields")
      m.fields.foreach(f.add)
      b.put("snapshot-id", m.snapshotId)
      b.put("sequence-number", m.sequenceNumber)
      b.put("offset", m.offset)
      b.put("length", m.length)
      if (m.properties.nonEmpty) {
        val p = b.putObject("properties")
        m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
      }
    }
    if (fileProps.nonEmpty) {
      val p = root.putObject("properties")
      fileProps.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
    }
    val payload = mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8)
    val footerSize = Magic.length + payload.length + 4 + 4 + Magic.length
    val out = ByteBuffer.allocate(
      Magic.length + blobs.map(_._6.length).sum + footerSize)
    out.put(Magic)
    blobs.foreach(b => out.put(b._6))
    out.put(Magic)
    out.put(payload)
    out.order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(payload.length)
    out.putInt(0) // Flags: payload uncompressed
    out.order(ByteOrder.BIG_ENDIAN)
    out.put(Magic)
    Written(out.array(), footerSize.toLong, metas)
  }

  /** Parse a Puffin file: validate all three magics and the footer
    * structure, refuse compressed payloads (outside the stated subset),
    * and return the blob metadata with each blob's payload sliced out.
    * Corruption REFUSES loudly — statistics that silently parse wrong
    * would mis-plan every query that trusts them. */
  def read(bytes: Array[Byte]): (Seq[BlobMeta], Seq[Array[Byte]], Map[String, String]) = {
    def magicAt(pos: Int): Boolean =
      pos >= 0 && pos + 4 <= bytes.length &&
        java.util.Arrays.equals(bytes.slice(pos, pos + 4), Magic)
    require(magicAt(0), "not a Puffin file: leading magic missing")
    require(magicAt(bytes.length - 4), "Puffin footer: trailing magic missing")
    val flagsAt = bytes.length - 8
    val sizeAt = bytes.length - 12
    val flags = ByteBuffer.wrap(bytes, flagsAt, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt()
    require((flags & 1) == 0,
      "Puffin footer payload is compressed — outside this subset, refusing")
    val payloadSize = ByteBuffer.wrap(bytes, sizeAt, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt()
    val payloadAt = sizeAt - payloadSize
    require(magicAt(payloadAt - 4), "Puffin footer: leading footer magic missing")
    val root = mapper.readTree(
      new String(bytes, payloadAt, payloadSize, StandardCharsets.UTF_8))
    val metas = scala.collection.mutable.ArrayBuffer.empty[BlobMeta]
    root.path("blobs").forEach { b =>
      val fields = scala.collection.mutable.ArrayBuffer.empty[Int]
      b.path("fields").forEach(f => fields += f.asInt())
      val props = scala.collection.mutable.Map.empty[String, String]
      if (b.has("properties")) b.get("properties").properties().forEach(e =>
        props(e.getKey) = e.getValue.asText())
      metas += BlobMeta(b.get("type").asText(), fields.toSeq,
        b.get("snapshot-id").asLong(), b.get("sequence-number").asLong(),
        b.get("offset").asLong(), b.get("length").asLong(), props.toMap)
    }
    val payloads = metas.map { m =>
      require(m.offset >= 4 && m.offset + m.length <= payloadAt - 4,
        s"Puffin blob at ${m.offset}+${m.length} escapes the data region")
      bytes.slice(m.offset.toInt, (m.offset + m.length).toInt)
    }
    val fileProps = scala.collection.mutable.Map.empty[String, String]
    if (root.has("properties")) root.get("properties").properties().forEach(e =>
      fileProps(e.getKey) = e.getValue.asText())
    (metas.toSeq, payloads.toSeq, fileProps.toMap)
  }
}
