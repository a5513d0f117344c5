package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hero-lane data scaler (round-17 verdict item 1: the sf0.1 local[32]
  * bench is per-query fixed-cost dominated — 8 cores beat 32 on the
  * suite total — so per-query optimization claims need a LARGER-SF
  * measurement lane).
  *
  * The driver's testdata is read-only and ships no sf1, so this tool
  * derives one DETERMINISTICALLY from sf0.1: R structure-preserving
  * replicas unioned per table, where replica k
  *   - offsets every surrogate id (doc/vec/event/user + TPC-H keys) by
  *     k·STRIDE — foreign keys stay consistent because both sides of
  *     every FK shift by the same stride (nation/region dimension keys
  *     are left alone and those tables are not replicated);
  *   - suffixes every WORD of document text with "x<k>" (replica 0 is
  *     the identity), so word-keyed joins (overlap graph, shingles,
  *     word-grams, BPE) behave exactly as at sf0.1 WITHIN a replica and
  *     never match ACROSS replicas: the edge/pair/family structure
  *     scales linearly instead of degenerating into R-fold exact
  *     duplicates (which would blow candidate generation quadratically
  *     and measure a workload nothing in production looks like);
  *   - perturbs embeddings by a tiny deterministic per-replica offset
  *     so vector distances are never exactly tied across replicas.
  *
  * No randomness anywhere: the output is a pure function of sf0.1, so
  * re-running the tool reproduces the lane byte-for-byte (modulo
  * parquet encoding nondeterminism across Spark versions).
  *
  * Usage: sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /root/herodata/sf1 10"
  */
object ScaleUp {
  // even (preserves the mate-pair doc XOR 1 pairing) and far above any
  // key value at the source scales
  val Stride = 1000000000L

  def main(args: Array[String]): Unit = {
    val Array(src, dst, rStr) = args.take(3)
    val r = rStr.toInt
    val spark = graft.GraftSession.get()

    def reps(base: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until r).map(k => f(base, k)).reduce(_ unionByName _)

    def offset(c: String, k: Int) = (col(c) + lit(k * Stride)).as(c)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"SCALEUP $name rows=${spark.read.parquet(s"$dst/$name.parquet").count()}")
    }

    // word suffix alone is NOT enough: char k-shingles in long word
    // INTERIORS would stay identical across replicas, so char-MinHash
    // signatures collide replica-to-replica and the near-dup pair space
    // grows QUADRATICALLY in the replica count (measured: q57 ~98 s at
    // the 10× lane vs ~4 s at sf0.1 — 10 near-copies of every doc is a
    // workload no real corpus has). A per-replica 1:1 substitution
    // cipher (class-wise rotation over [a-z][A-Z][0-9], replica 0
    // identity) keeps word lengths, boundaries and within-replica
    // equalities exact while making CHAR space replica-disjoint too.
    val lo = "abcdefghijklmnopqrstuvwxyz"
    val up = lo.toUpperCase
    val dg = "0123456789"
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    write("documents", reps(docs) { (d, k) =>
      if (k == 0) d
      else {
        val suffixed = array_join(
          transform(split(col("text"), " "), w => concat(w, lit(s"x$k"))), " ")
        val t = translate(suffixed, lo + up + dg, rot(lo, k) + rot(up, k) + rot(dg, k))
        d.select(offset("doc_id", k), t.as("text"), col("lang"), col("source"),
          length(t).cast("long").as("n_chars"))
      }
    })

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    write("embeddings", reps(emb) { (e, k) =>
      if (k == 0) e
      else e.select(offset("vec_id", k),
        transform(col("embedding"), (v, i) =>
          (v + lit(k * 0.001f) * sin(col("vec_id") + i)).cast("float")).as("embedding"),
        col("label"))
    })

    val events = spark.read.parquet(s"$src/events.parquet")
    write("events", reps(events) { (e, k) =>
      if (k == 0) e
      else e.select(offset("event_id", k), col("ts"), offset("user_id", k),
        col("event_type"), col("value"), col("props"))
    })

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    write("lineitem", reps(li) { (e, k) =>
      if (k == 0) e
      else e.select(offset("l_orderkey", k), offset("l_partkey", k), offset("l_suppkey", k),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    })

    val ord = spark.read.parquet(s"$src/orders.parquet")
    write("orders", reps(ord) { (e, k) =>
      if (k == 0) e
      else e.select(offset("o_orderkey", k), offset("o_custkey", k), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    })

    val cust = spark.read.parquet(s"$src/customer.parquet")
    write("customer", reps(cust) { (e, k) =>
      if (k == 0) e
      else e.select(offset("c_custkey", k), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    })

    val supp = spark.read.parquet(s"$src/supplier.parquet")
    write("supplier", reps(supp) { (e, k) =>
      if (k == 0) e
      else e.select(offset("s_suppkey", k), col("s_name"), col("s_nationkey"), col("s_acctbal"))
    })

    val part = spark.read.parquet(s"$src/part.parquet")
    write("part", reps(part) { (e, k) =>
      if (k == 0) e
      else e.select(offset("p_partkey", k), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size"), col("p_retailprice"))
    })

    // dimension tables: single copy, keys untouched (FKs reference them as-is)
    write("nation", spark.read.parquet(s"$src/nation.parquet"))
    write("region", spark.read.parquet(s"$src/region.parquet"))

    spark.stop()
  }
}
