package graft.sinks

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.DataFrame

/** schema.yaml sidecar (cda-client FileBasedOutputWriter.scala:96-116):
  * one entry per column with name / simple type / nullability.
  */
object SchemaDoc {

  val SchemaFileName = "schema.yaml"

  def schemaYamlString(df: DataFrame): String = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val fields = df.schema.fields.map { f =>
      val m = new java.util.LinkedHashMap[String, Any]()
      m.put("name", f.name)
      m.put("dataType", f.dataType.simpleString)
      m.put("nullable", f.nullable)
      m
    }
    mapper.writeValueAsString(fields)
  }

  /** Write the sidecar next to a table folder; returns the file path. */
  def writeSchemaYaml(df: DataFrame, folder: String): String = {
    val dir = Paths.get(folder)
    Files.createDirectories(dir)
    val p = dir.resolve(SchemaFileName)
    Files.write(p, schemaYamlString(df).getBytes("UTF-8"))
    p.toString
  }
}
