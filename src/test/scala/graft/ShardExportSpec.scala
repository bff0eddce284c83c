package graft

import org.scalatest.matchers.should.Matchers

import graft.llm.ShardExport
import graft.model.Tables

/** X265: the ustar writer must produce archives a REAL tar implementation
  * accepts (GNU tar conformance check), the parser must round-trip them,
  * and the export must be byte-deterministic. */
class ShardExportSpec extends SparkSpec with Matchers {

  test("exported shards are valid ustar archives per GNU tar") {
    val docs = Tables.documents(spark, sf0001).limit(40)
    val dir = ShardExport.exportShards(docs)
    val tars = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    tars.length shouldBe ShardExport.NShards
    tars.foreach { t =>
      val p = new ProcessBuilder("tar", "-tf", t.getAbsolutePath)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor() shouldBe 0 // GNU tar parses the archive
      out.linesIterator.forall(_.matches("doc_\\d{12}\\.txt")) shouldBe true
    }
  }

  test("parseTar round-trips members in order; export is byte-deterministic") {
    val docs = Tables.documents(spark, sf0001).limit(40)
    val dir1 = ShardExport.exportShards(docs)
    val dir2 = ShardExport.exportShards(docs)
    val f1 = new java.io.File(dir1).listFiles().sortBy(_.getName)
    val f2 = new java.io.File(dir2).listFiles().sortBy(_.getName)
    f1.zip(f2).foreach { case (a, b) =>
      val ba = java.nio.file.Files.readAllBytes(a.toPath)
      val bb = java.nio.file.Files.readAllBytes(b.toPath)
      ba should equal(bb) // same input → identical archive bytes
      val members = ShardExport.parseTar(ba)
      // member names strictly ascending = archive order is doc_id order
      val names = members.map(_._1)
      names shouldBe names.sorted
      // contents match the source rows
      val byId = docs.collect().map(r =>
        f"doc_${r.getAs[Long]("doc_id")}%012d.txt" ->
          r.getAs[String]("text")).toMap
      members.foreach { case (n, data) =>
        new String(data, "UTF-8") shouldBe byId(n)
      }
    }
  }
}
