package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** STORE-HEALTH OBSERVABILITY and the MAINTENANCE VERDICT — the
  * plan/execute pair for the storage layer, mirroring the tokenizer
  * loop's discipline ([[graft.pipeline.Retrain]]): a monitor measures,
  * a plan names the proportional response per store, an executor runs
  * exactly that and returns receipts. Deletion surgery
  * ([[CorpusForget]]/[[PackForget]]) wears a dataset down in two
  * measurable ways — `.forget` name chains (one level per takedown
  * batch touching the file) and coalesce(1) fragment files — and
  * [[ParquetSurgery.compact]] is the repair; this module decides WHEN,
  * so a deployment schedules one call instead of hand-reading
  * directories.
  *
  * Reference: voussoir/hnarchive's single SQLite file needs `VACUUM` at
  * most (hnarchive.py:60-75 opens one mutable database); an immutable
  * parquet corpus instead accumulates surgery debt per file, so the
  * health signal is a LISTING property — no data is scanned to decide.
  *
  * Scale shape: [[describe]] is one directory walk (file names + sizes
  * from metadata — zero parquet bytes read); [[plan]] is driver-side
  * arithmetic over one row per store; [[execute]] pays one
  * read+rewrite per store the plan flags, each of which is the
  * O(dataset) compaction the verdict says is now cheaper than carrying
  * the debt. */
object Maintenance {

  /** One store's LISTING-derived health: data files, total bytes, how
    * many files wear a `.forget` chain, the deepest chain, and how many
    * files sit under `smallBytes` (the fragment signal — surgery
    * rewrites are coalesce(1), so repeated takedowns shrink touched
    * files toward row-group-sized fragments that tax the scan
    * planner). */
  final case class Health(files: Long, bytes: Long, chained: Long,
                          maxChain: Int, smallFiles: Long)

  /** Walk the dataset's listing — names and sizes only, no parquet
    * bytes — and fold the health row. Heals first: a crash-window
    * duplicate would double-count. */
  def describe(dir: String, smallBytes: Long = 8L << 20): Health = {
    ParquetSurgery.healPending(dir)
    val files = ParquetSurgery.dataFiles(dir)
    val chains = files.map { p =>
      val n = p.getFileName.toString
      // depth = occurrences of the ".forget" link in the name chain
      n.sliding(".forget.".length).count(_ == ".forget.")
    }
    Health(
      files = files.size.toLong,
      bytes = files.map(Files.size).sum,
      chained = chains.count(_ > 0).toLong,
      maxChain = if (chains.isEmpty) 0 else chains.max,
      smallFiles = files.count(Files.size(_) < smallBytes).toLong)
  }

  /** One store's verdict: `compact` when the surgery debt crossed a
    * ceiling, `none` otherwise — with the health row that justified it
    * (the receipt a scheduler logs either way). */
  final case class Verdict(name: String, dir: String, action: String,
                           health: Health)

  /** Name each store's proportional response.
    *
    *  - **`compact`** — the chain depth reached `maxChain` (name-length
    *    debt: every level is a takedown batch that touched the file;
    *    filesystem name limits sit ~17 levels out, so the default
    *    ceiling of 4 compacts an order of magnitude early), OR
    *    fragments dominate (at least `minFiles` data files AND more
    *    than `smallFracMilli`‰ of them under the small-file bar — a
    *    fresh store of a few small files is healthy; a hundred
    *    fragments is a worn one).
    *  - **`none`** — anything else: compaction rewrites the whole
    *    dataset, so running it without cause is the O(corpus) cost the
    *    surgery legs exist to avoid.
    *
    * Thresholds are per-deployment knobs with documented defaults, not
    * magic: the chain ceiling is a count of takedown batches, the
    * fragment bar a fraction of the store's own listing. */
  def plan(stores: Seq[(String, String)], maxChain: Int = 4,
           smallBytes: Long = 8L << 20, smallFracMilli: Long = 500L,
           minFiles: Long = 16L): Seq[Verdict] = {
    require(maxChain > 0, s"maxChain must be > 0, got $maxChain")
    val dup = stores.groupBy(_._1)
      .collect { case (n, ss) if ss.sizeIs > 1 => n }
    require(dup.isEmpty,
      s"maintenance plan names ${dup.toSeq.sorted.mkString(", ")} more " +
        "than once — one verdict per store")
    stores.map { case (name, dir) =>
      require(Files.exists(Paths.get(dir)),
        s"maintenance target '$name' points at $dir which does not " +
          "exist — a plan over a typo'd store is a stale plan")
      val h = describe(dir, smallBytes)
      val worn = h.maxChain >= maxChain ||
        (h.files >= minFiles &&
          h.smallFiles * 1000L > h.files * smallFracMilli)
      Verdict(name, dir, if (worn) "compact" else "none", h)
    }
  }

  /** One executed verdict: the action taken and, for compacted stores,
    * the compaction receipt (`none` stores carry no receipt — an
    * untouched store costs zero reads, the churn discipline). */
  final case class Executed(name: String, action: String,
                            receipt: Option[ParquetSurgery.CompactReceipt])

  /** Run the verdicts: `compact` stores through
    * [[ParquetSurgery.compact]] (crash-safe via its commit marker —
    * an interrupted execute is re-runnable as a whole), `none` stores
    * untouched. Fails loud on an action it does not recognize — a
    * future plan column must not silently no-op. */
  def execute(spark: SparkSession, verdicts: Seq[Verdict],
              targetBytes: Long = 128L << 20): Seq[Executed] =
    verdicts.map { v =>
      v.action match {
        case "none" => Executed(v.name, "none", None)
        case "compact" => Executed(v.name, "compact",
          Some(ParquetSurgery.compact(spark, v.dir, targetBytes)))
        case other => throw new IllegalArgumentException(
          s"unknown maintenance action '$other' for store '${v.name}'")
      }
    }
}
