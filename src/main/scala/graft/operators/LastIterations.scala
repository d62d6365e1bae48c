package graft.operators

/** Self-registering executed-round counters for iterative operators.
  *
  * Bench attributes a slow iterative key to rounds × per-round actions via
  * its `iterations` line. Hard-coding `if (name == ...)` hooks in Bench
  * meant every NEW iterative operator silently lost that attribution until
  * someone edited Bench — so the binding now lives where the query key is
  * declared: the query group registers `queryKey -> counter` at object
  * init (which runs before Bench's query loop, because Bench reads the
  * keys through `SparkEntry.queries`), and Bench just snapshots whatever
  * is registered after timing each key.
  */
object LastIterations {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, () => Int]

  /** Bind a bench query key to its operator's executed-round counter
    * (typically a `lastIterations` volatile; re-registration overwrites). */
  def register(queryKey: String)(counter: => Int): Unit =
    m.put(queryKey, () => counter)

  /** The executed-round count for `queryKey`, if it is a registered
    * iterative key whose operator has run (counters are -1 before any
    * run — filtered out so Bench never prints a sentinel as a count). */
  def get(queryKey: String): Option[Int] =
    Option(m.get(queryKey)).map(_.apply()).filter(_ >= 0)

  /** Visible for tests: every registered key. */
  private[graft] def registeredKeys: Set[String] = {
    val it = m.keySet.iterator
    val b = Set.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }
}
