import parser.RootClass
import parser.file.{EventExtractor, FileParser}
import parser.trace.TraceIDParser
import parser.trace.TraceIDParser.generateXMLLog
import schema.SchemaExtractor

import java.nio.file.Paths

/** Like RefDriver but also dumps the reference's schema console format
  * (cli/package.scala printDatabaseSchema body) to <out>.schema.txt,
  * and makes the XES write optional (root = "-" skips it). */
object RefDriver2 {
  def main(args: Array[String]): Unit = {
    val path = Paths.get(args(0))
    val rootName = args(1)
    val outPath = args(2)
    if (args.length > 3) cli.dateFormatString = args(3)
    if (args.length > 4) cli.strictPrimaryKeyChecking = args(4) == "strict"
    scala.util.Random.setSeed(42L)
    val logEntries = FileParser.getAndParseLogFile(path)
    val parsedLogEntries = FileParser.parseLogEntries(logEntries)
    val transformedLogEntries =
      EventExtractor.transformRowIdentifiers(parsedLogEntries)
    val databaseSchema =
      SchemaExtractor.extractDatabaseSchema(transformedLogEntries)
    val dump = databaseSchema.map(table => table._2.toString).mkString("\n\n")
    java.nio.file.Files.write(
      Paths.get(outPath + ".schema.txt"),
      dump.getBytes("UTF-8"))
    if (rootName != "-") {
      val rootClass = RootClass(rootName)
      require(databaseSchema.keySet.contains(rootClass.tableID))
      val traces = TraceIDParser.createTracesForPattern(
        rootClass, databaseSchema, transformedLogEntries)
      val log = generateXMLLog(traces, rootClass)
      TraceIDParser.serializeLogToDisk(log, outPath)
    }
    println(s"wrote $outPath (+schema)")
  }
}
