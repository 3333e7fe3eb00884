import parser.file.{EventExtractor, FileParser}
import schema.SchemaExtractor
import java.nio.file.Paths

object Probe {
  def main(args: Array[String]): Unit = {
    scala.util.Random.setSeed(42L)
    val logEntries = FileParser.getAndParseLogFile(Paths.get(args(0)))
    val parsed = FileParser.parseLogEntries(logEntries)
    val transformed = EventExtractor.transformRowIdentifiers(parsed)
    val schema = SchemaExtractor.extractDatabaseSchema(transformed)
    schema.foreach { case (tid, table) =>
      table.columns.foreach { case (cname, col) =>
        println(s"$tid.$cname increasing=${col.areValuesIncreasing} canBePK=${col.canBePrimaryKey} nvals=${col.values.size}")
        if (cname == "ID" && tid.contains("USERS"))
          println("  values order: " + col.values.values.toSeq.take(20).mkString(","))
      }
    }
  }
}
