package graft.io

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** S19/X3/O9: JSON configuration source (reference config.json →
  * Get-AppConfig, private/Config.ps1:14-24; schema per README.md:47-68 /
  * FIXTURES.md §1.8). Jackson ships on the Spark classpath. */
case class SourceConfig(uri: String, database: String, collection: String)
case class SinkConfig(server: String, port: Int, database: String,
    username: String, password: String)
case class EngineConfig(
    mongo: SourceConfig,
    mysql: Option[SinkConfig],
    sqlserver: Option[SinkConfig],
    batchSize: Int)

object EngineConfig {
  private val mapper = new ObjectMapper()

  /** Parse + validate (the reference's bootstrap passes a nonexistent
    * parameter and proceeds, quirk Q10 — here missing required sections are
    * a hard error). */
  def parse(json: String): EngineConfig = {
    val root = mapper.readTree(json)
    def req(node: JsonNode, field: String, ctx: String): JsonNode = {
      val v = node.get(field)
      require(v != null, s"config: missing required field $ctx.$field")
      v
    }
    val mongoNode = req(root, "MongoDB", "")
    val mongo = SourceConfig(
      req(mongoNode, "ConnectionString", "MongoDB").asText(),
      req(mongoNode, "Database", "MongoDB").asText(),
      req(mongoNode, "Collection", "MongoDB").asText())
    def sink(name: String): Option[SinkConfig] = Option(root.get(name)).map { n =>
      SinkConfig(req(n, "Server", name).asText(),
        Option(n.get("Port")).map(_.asInt).getOrElse(if (name == "MySQL") 3306 else 1433),
        req(n, "Database", name).asText(),
        req(n, "Username", name).asText(),
        req(n, "Password", name).asText())
    }
    val batch = Option(root.get("Migration"))
      .flatMap(m => Option(m.get("BatchSize")).map(_.asInt))
      .getOrElse(100) // reference default, Data_Migration.ps1:40
    require(sink("MySQL").nonEmpty || sink("SQLServer").nonEmpty,
      "config: at least one of MySQL/SQLServer required")
    EngineConfig(mongo, sink("MySQL"), sink("SQLServer"), batch)
  }

  def load(path: String): EngineConfig =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
}
