package graft.catalog

/** Pluggable REST-catalog auth managers (ref: catalog/rest/auth.py:40
  * `AuthManager`, :348 `AuthManagerFactory`; wiring rest/__init__.py:444 —
  * `auth.type` names a registered manager, or `custom` plus `auth.impl`
  * gives a class path, with per-type config under `auth.<type>.*`; a
  * catalog with no `auth.type` keeps the legacy OAuth2/bearer lifecycle).
  *
  * A manager returns the COMPLETE `Authorization` header value, so
  * schemes beyond Bearer (Basic, signed, custom) plug in without the
  * HTTP layer knowing about them. */
trait RestAuthManager {
  /** Complete Authorization header value, or None to send no header. */
  def authHeader(): Option[String]
  /** Drop cached credentials (called once after a 401, before a retry). */
  def invalidate(): Unit = ()
  /** Whether a 401 is worth an invalidate + retry. */
  def canRefresh: Boolean = false
}

/** ref auth.py:52 — requests carry no Authorization header at all. */
final class NoopAuthManager(cfg: Map[String, String]) extends RestAuthManager {
  override def authHeader(): Option[String] = None
}

/** ref auth.py:59 — static `Basic base64(username:password)`. */
final class BasicAuthManager(cfg: Map[String, String]) extends RestAuthManager {
  private def req(k: String): String = cfg.getOrElse(k,
    throw new IllegalArgumentException(s"auth.basic.$k must be set"))
  private val header = "Basic " + java.util.Base64.getEncoder.encodeToString(
    s"${req("username")}:${req("password")}".getBytes("UTF-8"))
  override def authHeader(): Option[String] = Some(header)
}

/** Name → constructor registry (ref auth.py:348 AuthManagerFactory —
  * `register` for extensions, `create` resolves a registered name first,
  * then a fully-qualified class path with a `(Map[String, String])`
  * constructor). google/entra are not registered here: they need cloud
  * metadata endpoints this environment has no business calling — a user
  * supplies them as custom classes. */
object RestAuthManagers {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String] => RestAuthManager]()
  register("noop", cfg => new NoopAuthManager(cfg))
  register("basic", cfg => new BasicAuthManager(cfg))

  def register(name: String, ctor: Map[String, String] => RestAuthManager): Unit =
    registry.put(name, ctor)

  def create(classOrName: String, cfg: Map[String, String]): RestAuthManager =
    Option(registry.get(classOrName)) match {
      case Some(ctor) => ctor(cfg)
      case None =>
        val cls =
          try Class.forName(classOrName)
          catch {
            case _: ClassNotFoundException => throw new IllegalArgumentException(
              s"No registered auth manager or loadable class named '$classOrName'")
          }
        require(classOf[RestAuthManager].isAssignableFrom(cls),
          s"$classOrName does not implement RestAuthManager")
        cls.getConstructor(classOf[Map[String, String]])
          .newInstance(cfg).asInstanceOf[RestAuthManager]
    }
}
