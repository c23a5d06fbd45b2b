package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup keying.
  *
  * A crawled corpus carries the same page under many spellings —
  * scheme/host case, `www.` prefixes, explicit default ports, tracking
  * query params (`utm_*`, `fbclid`, `gclid`), param order, trailing
  * slashes, fragments. Canonicalizing to one normal form turns URL dedup
  * into an exact groupBy on a compact key — the cheapest dedup flavor
  * there is (one shuffle of (canon, id), no similarity math).
  *
  * Everything here is built from codegen'd string/array builtins
  * (regexp_extract / regexp_replace / filter / array_sort / concat), so
  * the whole normal form stays inside WholeStageCodegen and is exactly
  * mirrorable in the DuckDB oracle — the full pipeline is hash-checked,
  * not spot-checked.
  *
  * Scale shape: per-row projection (no shuffle) followed by one
  * groupBy(canon) with map-side partial aggregation. At 100 TB the
  * canonical key (~60 B) replaces the raw URL as the shuffle key and the
  * group-report output is bounded by the number of DUPLICATED canonical
  * URLs, not corpus size.
  */
object UrlCanon {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid)="

  /** Normal form of a URL:
    *   1. drop the fragment (`#...`);
    *   2. lowercase the scheme+authority prefix, strip a `www.` label and
    *      an explicit default port (`:443`/`:80`);
    *   3. strip trailing slashes from the path;
    *   4. drop tracking params, sort the survivors, rejoin with `&`
    *      (empty query → no `?`).
    */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val prefix = lower(regexp_extract(noFrag, "^([^:]+://[^/?#]*)", 1))
    val prefixC = regexp_replace(
      regexp_replace(prefix, "://www\\.", "://"), ":(443|80)$", "")
    // everything after the authority: "/path...?query"
    val rest = substring(noFrag,
      length(regexp_extract(noFrag, "^([^:]+://[^/?#]*)", 1)) + 1, lit(1 << 24))
    val path = regexp_replace(regexp_replace(rest, "\\?.*$", ""), "/+$", "")
    val query = regexp_extract(rest, "\\?([^#]*)", 1)
    val keptParams = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= lit("") && !p.rlike(TrackingParam))), "&")
    concat(prefixC, path,
      when(keptParams === lit(""), lit("")).otherwise(concat(lit("?"), keptParams)))
  }

  /** Canonical-URL duplicate groups: one row per canonical URL that
    * appears more than once — (canon, cnt, exemplar = min id).
    */
  def dupGroups(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(canonicalize(col(urlCol)).as("canon"), col(idCol).as("id"))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("exemplar"))
      .filter(col("cnt") > 1)
}
