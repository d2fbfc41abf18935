package graft.sinks

import org.apache.spark.sql.types.StructType

/** Schema-consistency gate before writing a fingerprint's batch —
  * the decision logic of the reference's `schemasAreConsistent`
  * (cda-client JdbcOutputWriter.scala:146-279):
  *
  *  - identical schemas → proceed;
  *  - incoming adds columns → evolve (the ALTER TABLE ADD statements
  *    to run first);
  *  - anything else (type change, dropped column) → bypass the batch
  *    and report why, exactly like the reference's warn-and-skip.
  */
object SchemaGate {

  sealed trait Decision
  case object Consistent extends Decision
  final case class Evolve(alterStatements: Seq[String]) extends Decision
  final case class Bypass(reasons: Seq[String]) extends Decision

  def check(existing: StructType, incoming: StructType,
            platform: JdbcDdl.DbPlatform, qualifiedTable: String,
            largeTextFields: Set[String] = Set.empty): Decision = {
    val existingByName = existing.fields.map(f => f.name.toLowerCase -> f).toMap
    val incomingByName = incoming.fields.map(f => f.name.toLowerCase -> f).toMap

    val dropped = existing.fields.filterNot(f => incomingByName.contains(f.name.toLowerCase))
    val changed = incoming.fields.flatMap { f =>
      existingByName.get(f.name.toLowerCase) match {
        case Some(old) if old.dataType != f.dataType =>
          Some(s"column '${f.name}' type changed: " +
            s"${old.dataType.simpleString} -> ${f.dataType.simpleString}")
        case _ => None
      }
    }
    val reasons = dropped.map(f => s"column '${f.name}' missing from incoming batch") ++ changed
    if (reasons.nonEmpty) Bypass(reasons.toIndexedSeq)
    else {
      val alters = JdbcDdl.alterAddColumnsDdl(platform, existing, incoming,
        qualifiedTable, largeTextFields)
      if (alters.isEmpty) Consistent else Evolve(alters)
    }
  }
}
