package graft.sql

/** Range splitting for parallel reads — semantics from
  * `/root/reference/dbeam-core/src/main/java/com/spotify/dbeam/args/ParallelQueryBuilder.java:117-174`:
  *
  *   - `bucketSize = ceil((max - min) / parallelism)`, floored at 1
  *   - ranges `[i, i+bucket)` half-open, final range `[i, max]` end-INCLUSIVE
  *   - degenerate inputs (max == min, parallelism > max-min) collapse to
  *     fewer ranges — never more than `parallelism`
  *
  * Golden cases (reference `ParallelQueryBuilderTest.java:38-105`):
  * 100..400/3 → [100,200) [200,300) [300,400]; 100..402/5 → bucket 61,
  * last [344,402]; 1..2/5 → single [1,2]; 1..1/5 → single [1,1].
  */
object ParallelRanges {

  /** start inclusive; end exclusive unless `endInclusive`. */
  final case class Range(start: Long, end: Long, endInclusive: Boolean)

  def generate(min: Long, max: Long, parallelism: Int): Vector[Range] = {
    require(parallelism > 0, "parallelism must be > 0")
    val bucket = math.max(1L, math.ceil((max - min).toDouble / parallelism).toLong)
    val builder = Vector.newBuilder[Range]
    var i = min
    while (i + bucket < max) {
      builder += Range(i, i + bucket, endInclusive = false)
      i += bucket
    }
    builder += Range(i, max, endInclusive = true)
    val ranges = builder.result()
    require(ranges.size <= parallelism, "Unable to generate expected number of ranges for given min max.")
    ranges
  }

  /** One SQL string per range, over a template query — reference
    * `ParallelQueryBuilder.java:117-134`.
    */
  def queriesForBounds(min: Long, max: Long, parallelism: Int, splitColumn: String, qb: QueryBuilder): Vector[String] =
    generate(min, max, parallelism).map(r =>
      qb.withParallelizationCondition(splitColumn, r.start, r.end, !r.endInclusive).build
    )
}
