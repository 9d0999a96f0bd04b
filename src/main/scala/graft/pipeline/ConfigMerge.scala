package graft.pipeline

/** Layered configuration (SURVEY §2.8 O12): base ⊕ environment ⊕
  * env-var overrides, as the reference's `ConfigManager`
  * (`src/config/settings.py:102-194`) — deep-merge maps, last writer
  * wins, env-var values land at declared dotted paths with boolean
  * coercion.
  */
object ConfigMerge {

  type Conf = Map[String, Any]

  /** Recursive merge: maps merge key-wise, anything else overrides
    * (`settings.py:149-159`). */
  def deepMerge(base: Conf, override_ : Conf): Conf =
    override_.foldLeft(base) { case (acc, (k, v)) =>
      (acc.get(k), v) match {
        case (Some(b: Map[String @unchecked, Any @unchecked]),
              o: Map[String @unchecked, Any @unchecked]) =>
          acc + (k -> deepMerge(b, o))
        case _ => acc + (k -> v)
      }
    }

  /** Parse a YAML document into the nested [[Conf]] shape deepMerge
    * operates on (scalars → String/Int/Long/Double/Boolean, mappings →
    * Map, sequences → List) — the loader half of the reference's
    * `ConfigManager.load_config` (`settings.py:102-148`: read base,
    * read environment file, deep-merge). `${VAR}` placeholders are
    * NOT resolved here — they are config VALUES until
    * [[applyOverrides]] (or a caller) substitutes them, exactly as
    * the reference defers resolution to access time. */
  def fromYaml(yaml: String): Conf = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    def conv(n: com.fasterxml.jackson.databind.JsonNode): Any = {
      import scala.jdk.CollectionConverters._
      if (n.isObject)
        n.properties().asScala.map(e => e.getKey -> conv(e.getValue)).toMap
      else if (n.isArray) n.elements().asScala.map(conv).toList
      else if (n.isBoolean) n.asBoolean()
      else if (n.isInt) n.asInt()
      else if (n.isLong) n.asLong()
      else if (n.isFloatingPointNumber) n.asDouble()
      else if (n.isNull) null
      else n.asText()
    }
    conv(mapper.readTree(yaml)) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => throw new IllegalArgumentException(
        s"top-level YAML must be a mapping, got $other")
    }
  }

  /** Apply env-var overrides at dotted config paths
    * (`settings.py:161-194`): `"a.b.c" -> value`, with `"true"/"false"`
    * coerced to Boolean, intermediate maps created as needed. */
  def applyOverrides(conf: Conf, mappings: Map[String, String],
      env: Map[String, String]): Conf =
    mappings.foldLeft(conf) { case (acc, (envVar, path)) =>
      env.get(envVar) match {
        case None => acc
        case Some(raw) =>
          val value: Any = raw.toLowerCase match {
            case "true" => true
            case "false" => false
            case _ => raw
          }
          setPath(acc, path.split("\\.").toList, value)
      }
    }

  private def setPath(conf: Conf, path: List[String], value: Any): Conf =
    path match {
      case Nil => conf
      case last :: Nil => conf + (last -> value)
      case head :: rest =>
        val child = conf.get(head) match {
          case Some(m: Map[String @unchecked, Any @unchecked]) => m
          case _ => Map.empty[String, Any]
        }
        conf + (head -> setPath(child, rest, value))
    }

  /** Fetch a dotted path. */
  def getPath(conf: Conf, path: String): Option[Any] =
    path.split("\\.").toList.foldLeft(Option[Any](conf)) {
      case (Some(m: Map[String @unchecked, Any @unchecked]), k) => m.get(k)
      case _ => None
    }
}
