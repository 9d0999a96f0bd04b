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
