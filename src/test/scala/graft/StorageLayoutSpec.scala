package graft

import java.io.{FileNotFoundException, IOException}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks._

/** Path-shape semantics of the storage layouts, matching the
  * reference's local/S3 writer split (validate rules, s3→s3a data
  * prefix, key-based sidecar writes, bucket/key URI parsing).
  */
class StorageLayoutSpec extends AnyFunSuite {

  private def newStore(): (java.nio.file.Path, LocalFsObjectStore) = {
    val root = Files.createTempDirectory("objstore")
    (root, new LocalFsObjectStore(root))
  }

  test("ObjectUri parses bucket/key, rejects other schemes") {
    assert(ObjectUri.parse("s3://my-bucket/a/b/c") == ObjectUri("my-bucket", "a/b/c"))
    assert(ObjectUri.parse("s3://my.dotted.bucket/k") == ObjectUri("my.dotted.bucket", "k"))
    assert(ObjectUri.parse("s3://bucket-only") == ObjectUri("bucket-only", ""))
    assertThrows[IllegalArgumentException](ObjectUri.parse("hdfs://nn/a"))
    assertThrows[IllegalArgumentException](ObjectUri.parse("/local/path"))
  }

  test("scheme dispatch: s3 uri needs a client, local path never does") {
    val (_, store) = newStore()
    assert(StorageLayout.forPath("/tmp/x").isInstanceOf[LocalLayout])
    assert(StorageLayout.forPath("s3://b/p", Some(store)).isInstanceOf[ObjectStoreLayout])
    assert(StorageLayout.forPath("s3a://b/p", Some(store)).isInstanceOf[ObjectStoreLayout])
    assertThrows[IllegalArgumentException](StorageLayout.forPath("s3://b/p"))
    // odd local paths never reach the URI parser's exceptions
    assert(StorageLayout.forPath("/tmp/with space/x").isInstanceOf[LocalLayout])
  }

  test("local validate: existing dir ok, missing dir or file throws") {
    val dir = Files.createTempDirectory("out")
    LocalLayout(dir.toString).validate()
    assertThrows[IOException](LocalLayout(s"$dir/nope").validate())
    val f = Files.createTempFile("afile", ".txt")
    assertThrows[IOException](LocalLayout(f.toString).validate())
  }

  test("object-store validate: bucket must exist, prefix must not be an object") {
    val (root, store) = newStore()
    assertThrows[FileNotFoundException](
      ObjectStoreLayout("s3://missing/prefix", store).validate())
    Files.createDirectories(root.resolve("bkt"))
    ObjectStoreLayout("s3://bkt/out", store).validate() // ok: nothing there
    store.putObject("bkt", "taken", "x")
    assertThrows[IOException](ObjectStoreLayout("s3://bkt/taken", store).validate())
  }

  test("data prefix rewrites s3 to s3a; folder shape matches the reference layout") {
    val (root, store) = newStore()
    Files.createDirectories(root.resolve("bkt"))
    val s3 = ObjectStoreLayout("s3://bkt/cda/out", store)
    assert(s3.dataPrefix == "s3a://bkt/cda/out")
    // an s3a input stays s3a (not s3aa)
    assert(ObjectStoreLayout("s3a://bkt/cda/out", store).dataPrefix == "s3a://bkt/cda/out")
    assert(s3.folderFor("taccount", "fpA") == "s3a://bkt/cda/out/taccount/fpA")
    assert(s3.folderFor("taccount", "fpA", Some("170")) == "s3a://bkt/cda/out/taccount/fpA/170")
    val local = LocalLayout("/data/out")
    assert(local.folderFor("taccount", "fpA", Some("170")) == "/data/out/taccount/fpA/170")
  }

  test("schema sidecar writes through the object API with the raw key prefix") {
    val (root, store) = newStore()
    Files.createDirectories(root.resolve("bkt"))
    val s3 = ObjectStoreLayout("s3://bkt/cda/out", store)
    val key = s3.writeSchemaText("taccount", "fpA", Some("170"), "name: id\n")
    assert(key == "cda/out/taccount/fpA/170/schema.yaml") // KEY, not s3a path
    assert(store.getObjectAsString("bkt", key) == "name: id\n")
    // bucket-root uri: no leading slash in the key
    val rootLayout = ObjectStoreLayout("s3://bkt", store)
    assert(rootLayout.writeSchemaText("t", "fp", None, "y") == "t/fp/schema.yaml")
  }

  test("put into a missing bucket fails like S3") {
    val (_, store) = newStore()
    assertThrows[FileNotFoundException](store.putObject("ghost", "k", "v"))
  }

  test("AWSUtils surface: fileAsString / fileExists / pathExists on full uris") {
    val (root, store) = newStore()
    Files.createDirectories(root.resolve("bkt"))
    store.putObject("bkt", "cda/manifest.json", "{}")
    val layout = ObjectStoreLayout("s3://bkt/cda", store)
    assert(layout.fileAsString("s3://bkt/cda/manifest.json") == "{}")
    assert(layout.fileExists("s3://bkt/cda/manifest.json"))
    assert(!layout.fileExists("s3://bkt/cda/nope.json"))
    assert(layout.pathExists("s3://bkt/cda")) // prefix with objects below
    assert(!layout.pathExists("s3://bkt/elsewhere"))
  }

  test("client writes the csv sidecar through the storage layout") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // reuse the client workspace shape from ClientSpec, but csv format
    val work = Files.createTempDirectory("layoutclient").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$work/sp"))
    Seq((1L, 2, "a")).toDF("id", "gwcbi___operation", "v")
      .write.parquet(s"$work/cdc/t1/fpA/100")
    Files.write(java.nio.file.Paths.get(s"$work/cdc/manifest.json"),
      s"""{"t1": {"lastSuccessfulWriteTimestamp": "100", "dataFilesPath": "$work/cdc/t1",
         |  "schemaHistory": {"fpA": "100"}}}""".stripMargin.getBytes)
    val cfg = graft.config.GraftConfig.fromYaml(
      s"""sourceLocation: {baseDir: $work/cdc, manifestPath: $work/cdc/manifest.json}
         |outputLocation: {path: $work/out}
         |savepointsLocation: {path: $work/sp}
         |outputSettings: {exportTarget: file, fileFormat: csv}
         |""".stripMargin)
    val res = new graft.client.GraftClient(spark, cfg).run()
    assert(res.head.rowsWritten == 1)
    assert(Files.exists(java.nio.file.Paths.get(s"$work/out/t1/fpA/schema.yaml")))
  }
}
