import parser.RootClass
import parser.file.{EventExtractor, FileParser}
import parser.trace.TraceIDParser
import parser.trace.TraceIDParser.generateXMLLog
import schema.SchemaExtractor

import java.nio.file.Paths

/** RefDriver2 + flag args: any of "strict" / "updvals" after the
  * timestamp pattern set cli.strictPrimaryKeyChecking /
  * cli.includeUpdateValues, matching Main.scala's option wiring. */
object RefDriver3 {
  def main(args: Array[String]): Unit = {
    val path = Paths.get(args(0))
    val rootName = args(1)
    val outPath = args(2)
    if (args.length > 3 && args(3).nonEmpty) cli.dateFormatString = args(3)
    val flags = args.drop(4).toSet
    cli.strictPrimaryKeyChecking = flags.contains("strict")
    cli.includeUpdateValues = flags.contains("updvals")
    scala.util.Random.setSeed(42L)
    val logEntries = FileParser.getAndParseLogFile(path)
    val parsedLogEntries = FileParser.parseLogEntries(logEntries)
    val transformedLogEntries =
      EventExtractor.transformRowIdentifiers(parsedLogEntries)
    val databaseSchema =
      SchemaExtractor.extractDatabaseSchema(transformedLogEntries)
    val dump = databaseSchema.map(table => table._2.toString).mkString("\n\n")
    java.nio.file.Files.write(
      Paths.get(outPath + ".schema.txt"), dump.getBytes("UTF-8"))
    if (rootName != "-") {
      val rootClass = RootClass(rootName)
      require(databaseSchema.keySet.contains(rootClass.tableID))
      val traces = TraceIDParser.createTracesForPattern(
        rootClass, databaseSchema, transformedLogEntries)
      val log = generateXMLLog(traces, rootClass)
      TraceIDParser.serializeLogToDisk(log, outPath)
    }
    println(s"wrote $outPath")
  }
}
