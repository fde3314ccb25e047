import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Iterative-graph-operator scale measurement: `GraphScale [n] [mode]`
  * (default 2,000,000 nodes, mode `cc`) times the operator over
  * adversarial giant-structure shapes and prints result summaries.
  *
  * mode `cc` — Graph.connectedComponents over two single-component
  * shapes that stress the star rounds' per-node windows as the graph
  * contracts toward ONE center:
  *  - `tree`: node i links to i/2 (binary tree — depth log n, the
  *    center's window partition grows round over round);
  *  - `hub_chain`: nodes 1..n/2 all link to 0 (an immediate degree-n/2
  *    hub — the worst window partition exists from round one) and
  *    n/2..n chain onto it (diameter n/2 tail).
  *
  * mode `kcore` — Graph.kCore(k=4) over the binary tree (every node
  * deg ≤ 3, so the WHOLE tree unravels leaf-wave by leaf-wave: peel
  * depth = tree depth ≈ log₂ n, the worst cascade a real graph
  * produces at this size) anchored to a deg-6 ring over the first n/10
  * nodes that must survive as the core — measures per-round cost over
  * a shrinking edge set AND that the peel terminates on the exact
  * surviving core, not empty.
  *
  * mode `bfs` — Graph.bfsDistances from one source over the doubling
  * expander (i → 2i, 2i+1 mod n): diameter ≈ log₂ n with the frontier
  * roughly doubling each round — total traversal work O(|E|), the
  * frontier-expansion claim measured.
  *
  * Compile/run with the recipe in tools/README.md. Iteration progress
  * comes from the operator's own per-round jobs; wall-clock per shape
  * is the headline number. */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val mode = if (args.length > 1) args(1) else "cc"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[graph-scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val tree = spark.range(1, n)
      .select(col("id").as("src"), (col("id") / 2).cast("long").as("dst"))
    val hubChain = spark.range(1, n / 2)
      .select(col("id").as("src"), lit(0L).as("dst"))
      .unionByName(spark.range(n / 2, n)
        .select(col("id").as("src"), (col("id") - 1).as("dst")))
    if (mode == "cc" || mode == "all") {
      for ((label, edges) <- Seq("tree" -> tree, "hub_chain" -> hubChain);
           agg <- Seq(false, true)) {
        val variant = if (agg) "agg-rounds" else "window-rounds"
        val dist = time(s"$label/$variant n=$n cc+distribution") {
          val cc = graft.operators.Graph.connectedComponents(edges, "src", "dst",
            aggRounds = agg)
          cc.groupBy("component").agg(count(lit(1)).as("sz"))
            .groupBy("sz").agg(count(lit(1)).as("n_components"))
            .orderBy(col("sz")).collect()
        }
        dist.foreach(r => println(
          s"[graph-scale] $label/$variant component_size=${r.get(0)} n=${r.get(1)}"))
      }
    }
    if (mode == "kcore" || mode == "all") {
      val c = n / 10
      val ring = spark.range(0, c).select(col("id"))
        .select(col("id").as("src"),
          explode(array((col("id") + 1) % c, (col("id") + 2) % c,
            (col("id") + 3) % c)).as("dst"))
      val edges = tree.unionByName(ring)
      // A/B: batch peeling (re-shuffles all degrees each wave) vs
      // frontier-delta peeling (broadcasts the wave's removals, degree
      // relation is the only per-wave checkpoint) — same cascade, same
      // result asserted below
      for (frontier <- Seq(false, true)) {
        val variant = if (frontier) "frontier-peel" else "batch-peel"
        val core = time(s"tree_ring/kcore/$variant k=4 n=$n") {
          (if (frontier)
            graft.operators.Graph.kCoreFrontier(edges, "src", "dst", k = 4)
          else graft.operators.Graph.kCore(edges, "src", "dst", k = 4))
            .agg(count(lit(1)), min(col("core_deg")), max(col("core_deg")))
            .head()
        }
        println(s"[graph-scale] kcore/$variant n=$n " +
          s"core_nodes=${core.getLong(0)} " +
          s"deg_range=[${core.getLong(1)}, ${core.getLong(2)}] " +
          s"(expect core_nodes=$c: the tree unravels, the ring survives)")
      }
    }
    if (mode == "bfs" || mode == "all") {
      val doubling = spark.range(0, n)
        .select(col("id").as("src"),
          explode(array((col("id") * 2) % n, (col("id") * 2 + 1) % n)).as("dst"))
      val s = spark
      import s.implicits._
      val r = time(s"doubling/bfs n=$n") {
        graft.operators.Graph.bfsDistances(doubling, "src", "dst",
            sources = Seq(7L).toDF("node"))
          .agg(count(lit(1)), max(col("dist"))).head()
      }
      println(s"[graph-scale] bfs n=$n reached=${r.getLong(0)} " +
        s"max_dist=${r.getLong(1)}")
    }
    spark.stop()
  }
}
