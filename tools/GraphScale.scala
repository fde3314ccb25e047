import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Giant-component scale measurement for Graph.connectedComponents:
  * `GraphScale [n]` (default 2,000,000 nodes) times CC over two
  * adversarial single-component shapes and prints the component-size
  * distribution — the shapes that stress the star rounds' per-node
  * windows as the whole graph contracts toward ONE center:
  *
  *  - `tree`: node i links to i/2 (binary tree — depth log n, the
  *    center's window partition grows round over round);
  *  - `hub_chain`: nodes 1..n/2 all link to 0 (an immediate degree-n/2
  *    hub — the worst window partition exists from round one) and
  *    n/2..n chain onto it (diameter n/2 tail).
  *
  * Compile/run with the recipe in tools/README.md. Iteration progress
  * comes from the operator's own per-round jobs; wall-clock per shape
  * is the headline number. */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
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
    spark.stop()
  }
}
