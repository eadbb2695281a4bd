package graft.spark

/** Iceberg-style partition TRANSFORMS (hidden partitioning): the table
  * declares `bucket(8, url)` or `days(warc_ts)` ONCE at write time, writers
  * cluster data files by the transform value, and point/range queries on the
  * RAW column prune files without ever mentioning a partition column — the
  * schema never grows one (the emulation records per-file transform bounds
  * in the stats sidecar instead of Iceberg's manifest partition tuples; same
  * O(files) metadata, same pruning power).
  *
  * Transforms are deterministic PURE functions with a driver-side replay
  * ([[literal]]) so the read path can transform a query literal exactly the
  * way the write path transformed the rows — and a DuckDB oracle can replay
  * the whole layout (bucket uses the repo's standard md5-conv idiom, already
  * nibble-replayed by the q_train_shards oracle).
  *
  * `orderPreserving` transforms (days/truncate/identity) additionally
  * support RANGE pruning: transform bounds of a value range bound the
  * range's transform values, so `warc_ts BETWEEN a AND b` prunes on
  * `[days(a), days(b)]`. Bucket is not order-preserving — equality only.
  */
sealed trait PartTransform {
  /** The raw source column queries filter on. */
  def col: String
  /** Sidecar pseudo-column carrying per-file transform bounds. */
  final def statName: String = s"part:$render"
  /** SQL computing the transform of `col` (STRING result), for the write
    * clustering pass and the per-file stats pass. */
  def sparkExprSql: String
  /** The transform of a query literal (the string form of the value),
    * replayed driver-side at read planning. */
  def literal(value: String): String
  def orderPreserving: Boolean
  def render: String
}

/** `bucket(n, col)`: md5-derived hash bucket in [0, n) — the equality-
  * lookup transform (url/digest point reads at 100 TB open ~1/n of the
  * files). Repo-standard idiom: first 8 md5 hex nibbles as a long, mod n.
  */
final case class BucketTransform(n: Int, col: String) extends PartTransform {
  require(n > 0, s"bucket($n): n must be positive")
  // bucket ids are ZERO-PADDED to the width of n-1 so lexicographic and
  // numeric order coincide: the stats writer's min/max is a plain string
  // min/max, while read-side pruning compares bounds at the numeric tier —
  // with unpadded ids ("2" > "15" byte-wise) a file spanning a digit-width
  // boundary records INVERTED bounds and point lookups silently prune it
  // away. Padded ids parse to the same longs, so old unpadded sidecars
  // (single-digit n, where padding is a no-op) stay compatible.
  private def width: Int = (n - 1).toString.length
  def sparkExprSql: String =
    s"lpad(CAST(CAST(conv(substr(md5(CAST(`$col` AS STRING)), 1, 8), 16, 10) AS BIGINT) % $n AS STRING), $width, '0')"
  def literal(value: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex8 = d.take(4).map(b => f"$b%02x").mkString
    val id = java.lang.Long.parseLong(hex8, 16) % n
    s"%0${width}d".format(id)
  }
  def orderPreserving: Boolean = false
  def render: String = s"bucket($n,$col)"
}

/** `days(col)`: calendar day of a timestamp — the time-range transform (a
  * warc_ts-windowed scan opens only the window's days). Accepts ISO-'T' or
  * space-separated literals.
  */
final case class DaysTransform(col: String) extends PartTransform {
  def sparkExprSql: String = s"date_format(`$col`, 'yyyy-MM-dd')"
  def literal(value: String): String = value.replace('T', ' ').take(10)
  def orderPreserving: Boolean = true
  def render: String = s"days($col)"
}

/** `truncate(w, col)`: leading-w-chars prefix of a string — the
  * lexicographic-range transform (host-prefix scans).
  */
final case class TruncateTransform(w: Int, col: String) extends PartTransform {
  require(w > 0, s"truncate($w): width must be positive")
  def sparkExprSql: String = s"substr(CAST(`$col` AS STRING), 1, $w)"
  def literal(value: String): String = value.take(w)
  def orderPreserving: Boolean = true
  def render: String = s"truncate($w,$col)"
}

/** `identity(col)`: the column itself (classic Hive-style value
  * partitioning, without the schema ever exposing it).
  */
final case class IdentityTransform(col: String) extends PartTransform {
  def sparkExprSql: String = s"CAST(`$col` AS STRING)"
  def literal(value: String): String = value
  def orderPreserving: Boolean = true
  def render: String = s"identity($col)"
}

object PartTransform {
  private val B = """bucket\((\d+),(.+)\)""".r
  private val D = """days\((.+)\)""".r
  private val T = """truncate\((\d+),(.+)\)""".r
  private val I = """identity\((.+)\)""".r

  def parse(s: String): PartTransform = s.trim match {
    case B(n, c) => BucketTransform(n.toInt, c)
    case D(c) => DaysTransform(c)
    case T(w, c) => TruncateTransform(w.toInt, c)
    case I(c) => IdentityTransform(c)
    case other => throw new IllegalArgumentException(s"unknown partition transform: $other")
  }
}
