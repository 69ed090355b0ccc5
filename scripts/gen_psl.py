#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/operators/PublicSuffix.scala from a
Public Suffix List snapshot (publicsuffix.org/list/public_suffix_list.dat
-- public data).

Usage:
    python3 scripts/gen_psl.py <snapshot.dat> [<output.scala>]

A deployment refreshes the tables with:
    curl -o /tmp/psl.dat https://publicsuffix.org/list/public_suffix_list.dat
    python3 scripts/gen_psl.py /tmp/psl.dat
    sbt compile && sbt "testOnly graft.operators.UrlsSpec"

The repo ships a curated snapshot subset (scripts/psl_snapshot.dat) so the
generator round-trips without network access; regenerating from the full
~9k-rule list produces the same shapes with longer Seqs.

Rule mapping (see Urls.registeredDomain's precedence):
  - 1-label plain rules ("com"): the expression's DEFAULT rule (last
    label is the suffix -> registrant = last 2 labels) already covers
    them; no table entry is emitted.
  - 2-label plain rules ("co.uk", "github.io"): TwoLabel.
  - 3-label plain rules ("s3.amazonaws.com"): ThreeLabel.
  - "*.<tld>" wildcards ("*.ck"): WildcardTlds.
  - "!" exceptions ("!www.ck"): Exceptions.
  - Deeper wildcards ("*.compute.amazonaws.com") cannot be expressed by
    the in-scan expression's fixed ladder; they are APPROXIMATED by
    emitting their base as a suffix one level up (here: ThreeLabel
    "compute.amazonaws.com" -> registrant "<x>.compute.amazonaws.com"
    instead of the PSL's "<y>.<x>.compute.amazonaws.com") and counted in
    the generation report.
  - 4+-label plain rules are likewise approximated by their last three
    labels and counted.
  - Non-ASCII (IDN) rules are emitted in punycode via the stdlib idna
    codec (hosts arrive punycoded); rules the codec rejects are skipped
    and counted.
"""
import datetime
import sys


def punycode(rule: str):
    if all(ord(c) < 128 for c in rule):
        return rule
    try:
        return ".".join(
            lbl.encode("idna").decode("ascii") if any(ord(c) >= 128 for c in lbl)
            else lbl
            for lbl in rule.split("."))
    except (UnicodeError, ValueError):
        return None


def parse(path: str):
    two, three, wild, exc = set(), set(), set(), set()
    private = set()  # two-label rules from the PRIVATE section (comment grouping)
    approx, skipped = [], []
    section = "icann"
    for raw in open(path, encoding="utf-8"):
        line = raw.strip()
        if not line:
            continue
        if line.startswith("//"):
            if "BEGIN PRIVATE" in line:
                section = "private"
            elif "BEGIN ICANN" in line:
                section = "icann"
            continue
        rule = line.split()[0].lower()
        asciirule = punycode(rule)
        if asciirule is None:
            skipped.append(rule)
            continue
        rule = asciirule
        if rule.startswith("!"):
            exc.add(rule[1:])
            continue
        labels = rule.split(".")
        if labels[0] == "*":
            rest = labels[1:]
            if len(rest) == 1:
                wild.add(rest[0])
            else:
                # inexpressible deep wildcard: approximate one level up
                approx.append(rule)
                if len(rest) == 2:
                    (private if section == "private" else two).add(".".join(rest))
                else:
                    three.add(".".join(rest[-3:]))
            continue
        if len(labels) == 1:
            continue  # the default rule already yields last-2 registrants
        if len(labels) == 2:
            (private if section == "private" else two).add(rule)
        elif len(labels) == 3:
            three.add(rule)
        else:
            approx.append(rule)
            three.add(".".join(labels[-3:]))
    return two, private, three, wild, exc, approx, skipped


def seq(values, indent="    "):
    items = [f'"{v}"' for v in sorted(values)]
    assert items, "empty rule table: snapshot is not a PSL file"
    lines, cur = [], ""
    for i, it in enumerate(items):
        piece = it + ("," if i < len(items) - 1 else "")
        if cur and len(indent) + len(cur) + 1 + len(piece) > 78:
            lines.append(cur)
            cur = piece
        else:
            cur = piece if not cur else cur + " " + piece
    if cur:
        lines.append(cur)
    return "\n".join(indent + ln for ln in lines)


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    snap = sys.argv[1]
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "src/main/scala/graft/operators/PublicSuffix.scala")
    two, private, three, wild, exc, approx, skipped = parse(snap)
    today = datetime.date.today().isoformat()
    two_body = seq(two)
    private_body = seq(private)
    three_body = seq(three)
    wild_body = ", ".join(f'"{w}"' for w in sorted(wild))
    exc_body = ", ".join(f'"{e}"' for e in sorted(exc))
    report = (f"{len(two)} ICANN two-label + {len(private)} private "
              f"two-label + {len(three)} three-label rules, "
              f"{len(wild)} wildcard TLDs, {len(exc)} exceptions; "
              f"{len(approx)} deep rules approximated, "
              f"{len(skipped)} IDN rules skipped")
    scala = f'''package graft.operators

/** Snapshot SUBSET of the Public Suffix List (publicsuffix.org — public
  * data) for [[Urls.registeredDomain]]'s eTLD+1 derivation: without it,
  * `bbc.co.uk` and `news.co.uk` would collapse to the meaningless
  * "co.uk" in per-domain caps and blocklists. GENERATED by
  * `scripts/gen_psl.py` from `{snap}` on {today}
  * ({report}) — regenerate from a current publicsuffix.org snapshot to
  * refresh (see the script header for the exact steps). Unknown TLDs
  * take the PSL default rule (`*` — the last label is the suffix),
  * which IS the last-2-label fallback the planted q98/q101 contract
  * pins.
  *
  * The tables are driver constants that ride the plan as typed literals
  * — the broadcast-lookup shape without a join, so the derivation stays
  * pure in-scan Column arithmetic like the rest of [[Urls]]. */
object PublicSuffix {{

  /** Two-label public suffixes: `<label>.<tld>` registries. */
  val TwoLabel: Seq[String] = Seq(
{two_body},
    // private registries: the registrant boundary a crawler cares about
{private_body})

  /** Three-label public suffixes. */
  val ThreeLabel: Seq[String] = Seq(
{three_body})

  /** PSL wildcard TLDs (`*.<tld>` — every second-level label under them
    * is itself a public suffix, e.g. `anything.ck`). */
  val WildcardTlds: Seq[String] = Seq({wild_body})

  /** PSL exception rules (`!` entries): hosts registrable DESPITE a
    * covering wildcard. */
  val Exceptions: Seq[String] = Seq({exc_body})
}}
'''
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(scala)
    print(f"wrote {out_path}: {report}")


if __name__ == "__main__":
    main()
