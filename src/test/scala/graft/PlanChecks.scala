package graft

/** Shared plan-shape assertions for specs.
  *
  * Formatted explain renders each operator once in the tree ("+- Exchange
  * (13)") and once in the details section ("(13) Exchange"); neither form
  * starts with, or is exactly, "Exchange ...", so the old
  * `startsWith("Exchange")` / `matches("Exchange .*")` counters matched
  * NOTHING and their assertions were vacuous. Count the details lines —
  * exactly one per operator — and keep a canary spec (PlanSpec) that fails
  * if a Spark upgrade changes the format out from under this.
  */
object PlanChecks {
  /** Number of shuffle Exchange operators in a FORMATTED explain string
    * (BroadcastExchange intentionally excluded — callers assert about
    * shuffles). */
  def shuffleExchanges(formattedPlan: String): Int =
    formattedPlan.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
}
