package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** The DENOMINATION STAMP — which tokenizer artifact a materialized
  * token dataset's ids are minted in. Pack shards, encoded corpora and
  * standing token indexes all carry token IDS whose meaning is a
  * specific frozen model; the moment [[graft.pipeline.Retrain.execute]]
  * re-freezes a group's tokenizer, every dataset encoded under the old
  * one is STALE — and without a stamp that staleness is silent: the
  * trainer reads well-formed longs that mean the wrong pieces. This is
  * the cheap, loud answer: one hidden metadata file per dataset naming
  * the algo and the 64-bit model hash ([[graft.operators.Unigram
  * .modelHash]] / [[graft.operators.Bpe.tokenizerHash]]), checked at
  * load.
  *
  * Reference: voussoir/hnarchive stores plain text and never re-encodes
  * (hnarchive.py:96-110); the stamp is the contract a TOKENIZED
  * artifact needs that a text one does not.
  *
  * Write discipline: the stamp file is dot-free but underscore-prefixed
  * (`_graft_denomination`) — hidden from Spark's listing like
  * `_SUCCESS`, so it never pollutes the data scan — and is published
  * whole via temp + `ATOMIC_MOVE` with `REPLACE_EXISTING`: RE-stamping
  * after a legitimate re-encode is an overwrite, not an append (the
  * ledger's first-write-wins rule is for immutable history; a
  * denomination is current state). [[ParquetSurgery.compact]] preserves
  * it for free — compaction rewrites data files and never touches
  * underscore-prefixed names. */
object Denomination {

  val FileName = "_graft_denomination"

  /** Deterministic 64-bit FNV-1a fold over an ordered part stream —
    * the hash [[graft.operators.Unigram.modelHash]] /
    * [[graft.operators.Bpe.tokenizerHash]] mint. Each part is mixed
    * char-by-char then terminated (so `["ab","c"]` ≠ `["a","bc"]`);
    * plain JVM arithmetic, no libm, identical on every executor. */
  def hash64(parts: IterableOnce[String]): Long = {
    val P = 0x100000001b3L
    var h = 0xcbf29ce484222325L
    parts.iterator.foreach { s =>
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        h ^= (c & 0xff); h *= P
        h ^= ((c >> 8) & 0xff); h *= P
        i += 1
      }
      h ^= 0x1f; h *= P // part terminator
    }
    h
  }

  /** Stamp `dir` as denominated in (`algo`, `hash`). Atomic,
    * overwrites any previous stamp. */
  def stamp(dir: String, algo: String, hash: Long): Unit = {
    Predef.require(algo.nonEmpty && !algo.contains('\n'),
      s"bad algo '$algo'")
    val root = Paths.get(dir)
    Files.createDirectories(root)
    val tmp = Files.createTempFile(root, "._graft_denom", ".tmp")
    Files.write(tmp, s"algo=$algo\nhash=$hash\n"
      .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, root.resolve(FileName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** The stamp at `dir`, if any. */
  def read(dir: String): Option[(String, Long)] = {
    val f = Paths.get(dir, FileName)
    if (!Files.exists(f)) None
    else {
      val kv = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
        .linesIterator.filter(_.contains('='))
        .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
        .toMap
      for (a <- kv.get("algo"); h <- kv.get("hash");
           hl <- h.toLongOption) yield (a, hl)
    }
  }

  /** Fail loud unless `dir` is stamped as (`algo`, `hash`) — the load
    * gate a trainer runs before reading token ids. An UNSTAMPED
    * dataset fails too: the absence of provenance is the same hazard
    * as wrong provenance, and the remedy (stamp at write time) is in
    * the message. */
  def require(dir: String, algo: String, hash: Long): Unit =
    read(dir) match {
      case None => throw new IllegalArgumentException(
        s"dataset at $dir carries no denomination stamp — its token ids " +
          s"cannot be tied to a tokenizer artifact; stamp it at write " +
          s"time with Denomination.stamp(dir, \"$algo\", <modelHash>)")
      case Some((a, h)) =>
        if (a != algo) throw new IllegalArgumentException(
          s"dataset at $dir is denominated in algo '$a', expected " +
            s"'$algo' — refusing to read token ids minted by a " +
            "different tokenizer family")
        else if (h != hash) throw new IllegalArgumentException(
          s"dataset at $dir is denominated in $a model $h, expected " +
            s"$hash — the tokenizer was retrained after this dataset " +
            "was encoded; re-encode it (or load the matching artifact)")
    }
}
