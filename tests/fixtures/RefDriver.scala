import parser.RootClass
import parser.file.{EventExtractor, FileParser}
import parser.trace.TraceIDParser
import parser.trace.TraceIDParser.generateXMLLog
import schema.SchemaExtractor

import java.nio.file.Paths

/** Non-interactive stand-in for cli.Main (which needs the `decline`
  * dependency, absent from this sandbox's artifact cache): identical
  * pipeline calls, root class from argv, fixed Random seed so the
  * reused-rowid suffixes are reproducible. */
object RefDriver {
  def main(args: Array[String]): Unit = {
    val path = Paths.get(args(0))
    val rootName = args(1)
    val outPath = args(2)
    if (args.length > 3) cli.dateFormatString = args(3)
    scala.util.Random.setSeed(42L)
    val logEntries = FileParser.getAndParseLogFile(path)
    val parsedLogEntries = FileParser.parseLogEntries(logEntries)
    val transformedLogEntries =
      EventExtractor.transformRowIdentifiers(parsedLogEntries)
    val databaseSchema =
      SchemaExtractor.extractDatabaseSchema(transformedLogEntries)
    val rootClass = RootClass(rootName)
    require(databaseSchema.keySet.contains(rootClass.tableID),
      s"root $rootName not in ${databaseSchema.keySet}")
    val traces = TraceIDParser.createTracesForPattern(
      rootClass, databaseSchema, transformedLogEntries)
    val log = generateXMLLog(traces, rootClass)
    TraceIDParser.serializeLogToDisk(log, outPath)
    println(s"wrote $outPath")
  }
}
