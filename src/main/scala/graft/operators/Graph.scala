package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics on DataFrames. Companion to the
  * connected-components resolution in [[Dedup.connectedComponents]]:
  * same per-round shape (equi-join + aggregate), same lineage
  * discipline (each round is cut with a localCheckpoint so the plan
  * does not grow with the iteration count).
  */
object Graph {

  /** Fixed-point PageRank over an edge list, in scaled INTEGER
    * arithmetic: ranks are maintained as `rank * scale` longs and
    * every per-edge contribution is the floor division
    * `(dampNum * r(u)) div (dampDen * outdeg(u))`, so each
    * iteration is exact integer arithmetic end-to-end — sums are
    * order-independent, results are identical on any engine that
    * replays the recurrence (q60's DuckDB oracle unrolls it in
    * SQL), and no float summation ever enters the loop. The
    * float-rank formulation would tie the result to Spark's
    * nondeterministic aggregation order; the classic
    * fixed-point-arithmetic trade accepts ~1/scale rounding per
    * edge for bit-reproducibility.
    *
    * Semantics: nodes = distinct endpoints; initial rank
    * `scale div N`; per iteration
    * `r'(v) = base + sum over in-edges of contrib(u, v)` with
    * `base = ((dampDen - dampNum) * scale) div (dampDen * N)`.
    * Dangling nodes (no out-edges) leak their damped mass — the
    * simple-variant convention, documented rather than
    * redistributed; ranks are relative ordering scores, not a
    * probability simplex.
    *
    * Scale shape: the out-degree join is precomputed once onto the
    * edge list (static across iterations); each iteration is one
    * equi-join of the rank table onto that edge list (shuffle on
    * src) plus one map-side-combinable aggregation (shuffle on dst)
    * — the canonical distributed PageRank step. Rank state is
    * localCheckpoint'd per round: without the cut the logical plan
    * doubles every iteration (the q47 lesson). */
  /** Exact triangle census with local clustering coefficients — the
    * third member of the graph tier (q60 ranks, q47 resolves
    * components, this measures cohesion: community density of a link
    * graph, co-citation tightness of a crawl frontier).
    *
    * Algorithm: degree-ordered orientation (Chiba–Nishizeki / the
    * MapReduce "count triangles by smallest-degree apex" scheme).
    * Each undirected edge {u,v} is directed from the endpoint that is
    * SMALLER in the total order (degree, node) to the larger one, so
    *  - every triangle is generated exactly once, at its unique
    *    minimum-order corner (no post-hoc dedup of 3! orderings), and
    *  - every out-neighborhood is bounded by O(sqrt(2m)) regardless
    *    of skew — a star graph's hub gets out-degree 0|1, so the
    *    wedge join below never materializes a hot node's deg^2 pairs.
    *    That bound, not the counting identity, is why this shape
    *    survives a power-law web graph at 100 TB; the naive
    *    three-way join on undirected edges does not.
    *
    * Plan shape (r16): one distinct (canonical edges), one degree
    * aggregate, the oriented edge list (checkpointed — its three
    * consumers would re-execute the whole upstream pipeline each),
    * then triangles by edge-centric NEIGHBORHOOD INTERSECTION: an
    * out-adjacency aggregate plus two equi-joins of the oriented
    * edges against it, with the closing corners z ∈ outN(x) ∩ outN(y)
    * computed inside codegen — the O(Σ outdeg²) wedge set is never
    * shuffled. All shuffles on edge keys, never a window over nodes,
    * never a driver collect.
    * Output: one row per node — `node`, `deg`, `n_tri`, and
    * `clust` = 2·tri / (deg·(deg−1)) (null when deg < 2), a single
    * correctly-rounded division so the double is cross-engine exact.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String,
                    maxKernelEdges: Int = 4000000): DataFrame = {
    val pairs = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    // Size-routed strategy (r18, the q31/q217 convention): up to
    // `maxKernelEdges` RAW canonical pairs the census runs as ONE
    // broadcast-CSR kernel; above the bound, the declarative
    // edge-intersection plan (the 100 TB shape) runs unchanged.
    // Routing on the RAW pair count (r18 opt pass, guide §2.4) makes
    // the kernel path EXCHANGE-FREE: the probe count is map-side
    // partials over the scan (no distinct shuffle, no checkpoint
    // caching), the collect re-reads the same deterministic scan, and
    // the exact dedup happens in dense-id space on the guard-admitted
    // driver array ([[densePairs]], one primitive sort). raw ≥
    // distinct, so the bound still caps what reaches the driver; a
    // duplicate-heavy graph routes conservatively to the declarative
    // plan, whose own distinct handles it at any scale (its distinct
    // exchanges dedup via ReusedExchange inside the one oriented-list
    // checkpoint job — the r16 probe measured checkpointing ue as
    // well SLOWER, o-only 1.35 s vs all-three 1.85 s).
    if (pairs.count() <= maxKernelEdges)
      triangleCountKernel(edges.sparkSession, pairs.collect())
    else triangleCountViaJoins(pairs.distinct())
  }

  /** The declarative edge-intersection census over canonical
    * undirected edges — the triangleCount branch that survives any
    * scale (see [[triangleCount]]'s scaladoc for the orientation
    * argument). */
  private def triangleCountViaJoins(ue: DataFrame): DataFrame = {
    // Only the ORIENTED edge list is localCheckpoint'd (the tier's
    // multi-pass materialization; GraphX caches its edge RDDs for
    // the same reason): it is the one frame whose three consumers
    // (adjacency build, both intersection joins) would otherwise
    // re-execute the whole scan→distinct→degree→orient pipeline each
    // (r16 probe: 35 exchanges, ~5 recomputations). Checkpointing ue
    // and deg as well was measured SLOWER — their recomputation is
    // two cheap scans, less than two extra materialization jobs
    // (Q105Probe variants: o-only 1.35 s vs all-three 1.85 s min).
    val deg = ue.select(col("u").as("node")).union(ue.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // Attach both endpoint degrees, then orient by (deg, node).
    val withDeg = ue
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"))
      .localCheckpoint()
    // Edge-centric neighborhood intersection (the GraphX shape,
    // replacing the r15 wedge self-join + closing join): under the
    // acyclic orientation every triangle has a unique apex x (out-deg
    // 2 within the triangle) and middle y, so for each oriented edge
    // (x, y) its closing corners are exactly z ∈ outN(x) ∩ outN(y) —
    // each triangle generated once, no ordering predicate needed.
    // outN stays O(sqrt(2m)) by the orientation, so the adjacency
    // arrays are skew-bounded, and the intersection runs inside
    // codegen on m join rows instead of shuffling the O(Σ outdeg²)
    // wedge set through two exchanges (r16: the 5M-row wedge
    // exchange was the census's whole cost at sf0.1).
    val adj = o.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs"))
    val tris = o
      .join(adj.select(col("src"), col("nbrs").as("nx")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("ny")), Seq("dst"))
      .select(col("src").as("x"), col("dst").as("y"),
        explode(array_intersect(col("nx"), col("ny"))).as("z"))
    val perNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    // The output degree table is rebuilt FROM the checkpointed
    // oriented list (each canonical edge appears exactly once in o,
    // so incident counts are identical to ue's) — consuming `deg`
    // here would re-execute its whole scan→distinct→aggregate
    // lineage a second time.
    val outDeg = o.select(col("src").as("node"))
      .union(o.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    outDeg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("clust",
        when(col("deg") >= 2,
          (col("n_tri") * 2L).cast("double") /
            (col("deg") * (col("deg") - 1L)).cast("double")))
  }

  /** Dense-id mapping + exact dedup of RAW canonical (u,v) pairs,
    * driver-side (r18 opt pass): the node universe sorts into a dense
    * index, each pair encodes as one long `(denseU << 32) | denseV`
    * (dense ids are < 2³¹ by the routing guard), and one primitive
    * `Arrays.sort` + unique-scan removes duplicates — no boxing, no
    * per-pair allocation, O(m log m). Shared by both broadcast-CSR
    * kernels so the routing probe can count RAW rows (exchange-free
    * scan) instead of paying a distinct shuffle before the guard. */
  private def densePairs(rows: Array[org.apache.spark.sql.Row])
      : (Array[Long], Array[Int], Array[Int]) = {
    val nodeSet = new java.util.TreeSet[java.lang.Long]()
    rows.foreach { r => nodeSet.add(r.getLong(0)); nodeSet.add(r.getLong(1)) }
    val nodes = new Array[Long](nodeSet.size())
    locally {
      var i = 0; val it = nodeSet.iterator()
      while (it.hasNext) { nodes(i) = it.next(); i += 1 }
    }
    def dense(x: Long): Int = java.util.Arrays.binarySearch(nodes, x)
    val enc = new Array[Long](rows.length)
    locally {
      var i = 0
      while (i < rows.length) {
        enc(i) = (dense(rows(i).getLong(0)).toLong << 32) |
          (dense(rows(i).getLong(1)).toLong & 0xffffffffL)
        i += 1
      }
    }
    java.util.Arrays.sort(enc)
    var m = 0
    locally {
      var i = 0
      while (i < enc.length) {
        if (i == 0 || enc(i) != enc(i - 1)) { enc(m) = enc(i); m += 1 }
        i += 1
      }
    }
    val eu = new Array[Int](m); val ev = new Array[Int](m)
    locally {
      var i = 0
      while (i < m) { eu(i) = (enc(i) >>> 32).toInt; ev(i) = enc(i).toInt; i += 1 }
    }
    (nodes, eu, ev)
  }

  /** Broadcast-CSR triangle kernel (r18): the collected canonical
    * pair list (raw; [[densePairs]] dedups exactly) becomes a
    * degree-oriented compressed adjacency on the driver (dense ids,
    * per-list sort — the same Chiba–Nishizeki orientation as the join
    * plan), broadcast once, and the edge-by-edge sorted-merge
    * intersections run in executor tasks over index ranges — triangle
    * counting is the arithmetic, with none of the join/aggregate
    * machinery around it (the q217 graph-serve lesson: ~100 ns/row of
    * operator overhead dominates a sub-second census). Per-task
    * scratch is one long[] of node width (guard-bounded). Output
    * identical to the join plan row-for-row (spec-pinned
    * differentially). */
  private def triangleCountKernel(spark: org.apache.spark.sql.SparkSession,
                                  rows: Array[org.apache.spark.sql.Row]): DataFrame = {
    import spark.implicits._
    val (nodes, eu, ev) = densePairs(rows)
    val n = nodes.length
    val m = eu.length
    val degArr = new Array[Int](n)
    locally {
      var i = 0
      while (i < m) { degArr(eu(i)) += 1; degArr(ev(i)) += 1; i += 1 }
    }
    // Orientation: lower (deg, node) endpoint points at the higher.
    @inline def firstLower(a: Int, b: Int): Boolean =
      degArr(a) < degArr(b) || (degArr(a) == degArr(b) && nodes(a) < nodes(b))
    val outDeg = new Array[Int](n)
    locally {
      var i = 0
      while (i < m) {
        if (firstLower(eu(i), ev(i))) outDeg(eu(i)) += 1 else outDeg(ev(i)) += 1
        i += 1
      }
    }
    val ptr = new Array[Int](n + 1)
    locally { var i = 0; while (i < n) { ptr(i + 1) = ptr(i) + outDeg(i); i += 1 } }
    val adj = new Array[Int](m)
    val ex = new Array[Int](m); val ey = new Array[Int](m)
    locally {
      val fill = java.util.Arrays.copyOf(ptr, n)
      var i = 0
      while (i < m) {
        val (x, y) = if (firstLower(eu(i), ev(i))) (eu(i), ev(i)) else (ev(i), eu(i))
        adj(fill(x)) = y; fill(x) += 1
        ex(i) = x; ey(i) = y
        i += 1
      }
      var v = 0
      while (v < n) { java.util.Arrays.sort(adj, ptr(v), ptr(v + 1)); v += 1 }
    }
    val bc = spark.sparkContext.broadcast((nodes, degArr, ptr, adj, ex, ey))
    val parts = spark.sparkContext.defaultParallelism.max(1)
    // Edge-range tasks: each intersects its slice's out-lists against
    // the broadcast CSR into one dense long[] of node width, and the
    // per-task arrays TREE-REDUCE by elementwise sum (exact — long
    // addition is associative/commutative) instead of shuffling
    // (nid, cnt) rows through a groupBy + left join: the reduced
    // array is ≤ 8·n bytes, strictly smaller than the edge list the
    // guard already admitted to the driver, and cutting the
    // aggregate+join tail removes three AQE shuffle jobs from a
    // sub-second census (r18 opt pass: 10 → ~5 jobs; the emit below
    // is the labelPropKernel broadcast+range convention, never a
    // driver-built frame).
    val counts: Array[Long] = spark.sparkContext
      .range(0L, parts.toLong, 1L, parts)
      .mapPartitions { ps =>
        val (_, _, bPtr, bAdj, bEx, bEy) = bc.value
        val mm = bEx.length
        val cnt = new Array[Long](bPtr.length - 1)
        ps.foreach { p =>
          val lo = (p * mm / parts).toInt
          val hi = ((p + 1) * mm / parts).toInt
          var i = lo
          while (i < hi) {
            val x = bEx(i); val y = bEy(i)
            var a = bPtr(x); val aEnd = bPtr(x + 1)
            var b = bPtr(y); val bEnd = bPtr(y + 1)
            while (a < aEnd && b < bEnd) {
              val za = bAdj(a); val zb = bAdj(b)
              if (za == zb) { cnt(x) += 1; cnt(y) += 1; cnt(za) += 1; a += 1; b += 1 }
              else if (za < zb) a += 1
              else b += 1
            }
            i += 1
          }
        }
        Iterator.single(cnt)
      }
      // reduce, not fold: fold would serialize its 8·n-byte zero
      // array into every task closure; reduce merges only the
      // per-partition results (each task emits exactly one array, so
      // the RDD is never empty). In-place += is safe — every operand
      // is a task-private deserialized copy.
      .reduce { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    val bcCnt = spark.sparkContext.broadcast(counts)
    spark.range(0, n.toLong).as[Long].map { i =>
      val (bNodes, bDeg, _, _, _, _) = bc.value
      (bNodes(i.toInt), bDeg(i.toInt).toLong, bcCnt.value(i.toInt))
    }.toDF("node", "deg", "n_tri")
      .withColumn("clust",
        when(col("deg") >= 2,
          (col("n_tri") * 2L).cast("double") /
            (col("deg") * (col("deg") - 1L)).cast("double")))
  }

  /** Bounded-round k-core peel — the graph tier's density filter
    * (q60 ranks, q47 resolves, q105 measures cohesion, this PRUNES
    * to the cohesive core): repeatedly drop nodes of degree < k and
    * re-filter edges to surviving endpoints, `rounds` times, then
    * return the surviving nodes with their core-subgraph degree.
    * Fixed rounds — not iterate-to-fixpoint — is what keeps the
    * operator ORACLE-REPLAYABLE (each round unrolls to one degree
    * CTE + one filter join, the q60 unrolled-recurrence pattern);
    * convergence on the gated workload happens within the round
    * budget and [[kCoreFixpoint]] is the to-convergence variant the
    * spec differentially checks against.
    *
    * Scale shape per round: one map-side-combinable degree aggregate
    * + two equi-joins of the (nodes-sized) survivor set back onto
    * the edge list — never a window, never a collect; edge state is
    * localCheckpoint'd per round so the plan does not grow with the
    * round count (the q47/q60 lineage lesson). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 0, "k >= 1 and rounds >= 0")
    var cur = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("node")).union(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    for (_ <- 1 to rounds) {
      val keep = degrees(cur).filter(col("deg") >= k)
      cur = cur
        .join(keep.select(col("node").as("u")), "u")
        .join(keep.select(col("node").as("v")), "v")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
    }
    degrees(cur).filter(col("deg") >= k)
  }

  /** [[kCore]] iterated to the true fixed point: peel until a round
    * removes nothing (each round's survivor count is one bounded
    * driver-side aggregate). The result is the maximal subgraph of
    * minimum degree ≥ k — the textbook k-core; bounded [[kCore]]
    * equals it whenever `rounds` covers the peel depth (spec-pinned
    * differentially on random graphs). */
  def kCoreFixpoint(edges: DataFrame, srcCol: String, dstCol: String,
                    k: Int, maxRounds: Int = 1000): DataFrame = {
    var cur = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("node")).union(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var prev = -1L
    var n = cur.count()
    var r = 0
    while (n != prev && r < maxRounds) {
      val keep = degrees(cur).filter(col("deg") >= k)
      cur = cur
        .join(keep.select(col("node").as("u")), "u")
        .join(keep.select(col("node").as("v")), "v")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      prev = n
      n = cur.count()
      r += 1
    }
    degrees(cur).filter(col("deg") >= k)
  }

  /** K-HOP REACHABILITY census — the BFS primitive the rest of the
    * graph tier lacks: for every node, how many distinct nodes lie
    * within `k` undirected hops (crawl-depth coverage, influence
    * radius, locality of a link neighborhood). Bounded `k` keeps the
    * op oracle-replayable: hop h unrolls to one equi-join of the
    * hop-(h−1) pair set onto the adjacency plus a distinct — the
    * q60/q114 bounded-recurrence pattern.
    *
    * Scale shape per hop — SEMI-NAIVE (Datalog's delta evaluation,
    * the GraphX/Pregel frontier discipline): only the FRONTIER (pairs
    * first discovered on the previous hop) joins the adjacency, never
    * the full accumulated reach set, and the candidates are
    * anti-joined against the accumulated set so each pair is
    * materialized exactly once. Per hop that is one shuffle join
    * (|frontier| × adjacency, not |reach| × adjacency), one distinct
    * over the candidates, and one anti-join — on graphs where balls
    * saturate within k hops the frontier shrinks toward zero while
    * the naive re-join keeps paying Σ|B_h| every hop. The loop
    * early-exits when the frontier drains (diameter < k), so k only
    * bounds the rounds. Total pair state is still Σ|B_k(u)| rows —
    * the honest cost of EXACT per-node reach; the sketch shortcut is
    * [[hyperBall]], and [[kHopReachAuto]] routes between the two. A
    * hub node's deg² candidate burst before the distinct is
    * AQE-skew-join territory; frontier state is localCheckpoint'd per
    * hop so the plan stays flat (the accumulated set is a union of
    * already-materialized checkpoints and needs no re-materialize).
    * Self-pairs are excluded throughout. */
  /** Canonical undirected edge set `(u < v)`, deduped and
    * MATERIALIZED (localCheckpoint): the one frame every graph
    * operator here starts from. Factored out so [[kHopReachAuto]]
    * can canonicalize ONCE and hand the same materialized frame to
    * the probe and whichever branch it routes to — the r12 q183
    * artifact paid this synthesis twice (probe + branch) plus the
    * branch's own re-canonicalization. */
  private[graft] def canonicalUndirected(edges: DataFrame, srcCol: String,
                                         dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

  def kHopReach(edges: DataFrame, srcCol: String, dstCol: String,
                k: Int): DataFrame =
    kHopReachCanonical(canonicalUndirected(edges, srcCol, dstCol), k)

  /** [[kHopReach]] over an already-canonical, already-materialized
    * `(u, v)` edge frame (see [[canonicalUndirected]]). */
  private[graft] def kHopReachCanonical(ue: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val adj = ue.select(col("u").as("node"), col("v").as("nbr"))
      .union(ue.select(col("v").as("node"), col("u").as("nbr")))
    // Pre-spread the frontier side of the hop join: a small adjacency
    // gets BROADCAST, so the join and the expensive dedup that
    // follows would otherwise inherit the checkpoint's few
    // AQE-coalesced partitions and run the deg²-expanded candidate
    // stream on a handful of cores (measured 2.8× slower at sf0.1).
    // An explicit-width repartition is exempt from AQE coalescing;
    // the shuffled rows are the narrow PRE-expansion frontier, so the
    // exchange is cheap relative to the expansion it parallelizes.
    val width = ue.sparkSession.sessionState.conf.numShufflePartitions
    def expand(frontier: DataFrame): DataFrame =
      frontier.select(col("node"), col("nbr").as("__mid"))
        .repartition(width, col("__mid"))
        .join(adj.select(col("node").as("__mid"), col("nbr")), "__mid")
        .select(col("node"), col("nbr"))
        .filter(col("node") =!= col("nbr"))
    var reach = adj
    var frontier = adj
    var h = 2
    var drained = false
    // Intermediate hops (h < k) must materialize the exact distinct
    // frontier — the next hop joins it. The LAST hop never does: its
    // candidates flow straight into the census, where
    // `count_distinct` dedups map-side inside one aggregation
    // exchange instead of paying a distinct shuffle + anti-join +
    // checkpoint for a pair set nobody reads again. At k=2 (the
    // common census depth) the whole op is one join + one aggregate.
    while (h < k && !drained) {
      val fresh = expand(frontier)
        .distinct()
        .join(reach, Seq("node", "nbr"), "left_anti")
        .localCheckpoint(true)
      if (fresh.isEmpty) drained = true
      else {
        reach = reach.union(fresh)
        frontier = fresh
      }
      h += 1
    }
    val lastCands = if (k >= 2 && !drained) expand(frontier) else reach.limit(0)
    reach.union(lastCands)
      .groupBy(col("node")).agg(count_distinct(col("nbr")).as("n_reach"))
  }

  /** Size-guarded k-hop reach: exact [[kHopReach]] for graphs up to
    * `maxExactEdges` input edges, [[hyperBall]] above it — the
    * [[Similarity.nearDupPairsAuto]] probe-and-route convention
    * applied to the one graph op whose exact path materializes
    * Σ|B_k(u)| pair rows (quadratic-ish on dense graphs). The edge
    * set is canonicalized and MATERIALIZED once up front (both
    * branches need exactly that frame anyway), the probe is a
    * bounded `limit(n+1).count()` on the materialized frame (no
    * upstream re-execution), and the routed branch consumes the
    * same frame — so the synthesis lineage above the operator runs
    * exactly once regardless of route.
    *
    * Both branches emit the same (node, n_reach) schema. On the
    * routed path n_reach is the HyperBall ball-cardinality ESTIMATE
    * minus one (HyperBall seeds each node's counter with itself;
    * exact reach excludes self-pairs), rounded half-up — within
    * HLL's ~1.04/√m relative error of the exact census, never a
    * silent semantic swap: callers that need the exact pair census
    * above the bound must call [[kHopReach]] explicitly.
    *
    * Default bound 2^20 edges: the exact path's per-hop frontier
    * join then stays within a single executor wave at 2-3 hops on
    * typical link-graph density, and the pair set stays well under
    * memory even if balls saturate. */
  def kHopReachAuto(edges: DataFrame, srcCol: String, dstCol: String,
                    k: Int, p: Int = 6,
                    maxExactEdges: Long = 1L << 20): DataFrame = {
    // Canonicalize ONCE: both branches start from the same distinct
    // (u, v) set and materialize it anyway, so probing the raw input
    // lineage separately just re-ran the upstream synthesis (the r12
    // q183 artifact paid the pipeline roughly twice). The probe is a
    // bounded count on the MATERIALIZED frame — no job re-runs — and
    // the routed branch consumes the very same frame. The bound is
    // thereby interpreted over canonical undirected edges (dups and
    // self-loops no longer count toward it), which is the quantity
    // the exact path's pair-set cost actually scales with.
    val ue = canonicalUndirected(edges, srcCol, dstCol)
    val probe = math.min(maxExactEdges + 1, Int.MaxValue.toLong).toInt
    val small = ue.limit(probe).count() <= maxExactEdges
    if (small) kHopReachCanonical(ue, k)
    else hyperBallCanonical(ue, k, p)
      .select(col("node"),
        floor(col("ball_estimate") - lit(0.5)).cast("long").as("n_reach"))
  }

  /** HYPERBALL — the approximate scale path [[kHopReach]] documents:
    * per-node k-hop ball CARDINALITY ESTIMATES via HyperLogLog
    * counters (Boldi–Rosa–Vigna's HyperBall, the algorithm behind
    * the published web-graph distance measurements). Every node
    * carries an HLL register set seeded with its own id; each round
    * merges every neighbor's registers by per-register max — set
    * union in sketch space — so after k rounds node u's counter
    * estimates |B_k(u)|, self included.
    *
    * Why this is the 100-TB shape: exact reach materializes the pair
    * set (Σ|B_k| rows — quadratic-ish on dense graphs); HyperBall
    * state is O(nodes × 2^p) FOREVER, regardless of ball size, and
    * each round is one equi-join + one max-aggregate (both map-side
    * combinable). The whole pipeline is integer register arithmetic
    * (md5-derived, [[Sketches.hllRegister]]/[[Sketches.hllRank]]), so
    * the register evolution — and therefore the estimate — is
    * deterministic and oracle-replayable; the finalize division is
    * the q56 correctly-rounded shape. GraphSpec pins the register
    * state to a driver-side BFS-ball replay EXACTLY, plus estimate
    * monotonicity in k. */
  def hyperBall(edges: DataFrame, srcCol: String, dstCol: String,
                k: Int, p: Int = 6): DataFrame =
    hyperBallCanonical(canonicalUndirected(edges, srcCol, dstCol), k, p)

  /** [[hyperBall]] over an already-canonical, already-materialized
    * `(u, v)` edge frame (see [[canonicalUndirected]]). */
  private[graft] def hyperBallCanonical(ue: DataFrame, k: Int, p: Int = 6): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val m = 1 << p
    val adj = ue.select(col("u").as("node"), col("v").as("nbr"))
      .union(ue.select(col("v").as("node"), col("u").as("nbr")))
    // The m registers ride as ONE m-byte binary per node, not m rows:
    // a ball's register set used to multiply every adjacency row by
    // its register count in the per-round join (~m× row blowup once
    // balls saturate — the dominant cost at sf0.1 was an ~18M-row
    // join feeding the max-merge). Packed, each round joins |adj|
    // binary rows and the union-in-sketch-space is an element-wise
    // byte max (rho ≤ 61−p < 127 always fits a signed byte; 0 marks
    // an empty register, distinct from any real rank since rank ≥ 1)
    // — commutative and associative, so aggregation order cannot
    // change the result and the evolution stays oracle-replayable.
    // (A 64-tinyint-COLUMN variant with m built-in `max` aggregates
    // was measured 1.9× SLOWER than this typed Aggregator at sf0.1 —
    // 64 agg buffer slots per group cost more than one in-place
    // byte-array merge, codegen notwithstanding.)
    val pack = udf((reg: Long, rho: Int) => {
      val a = new Array[Byte](m); a(reg.toInt) = rho.toByte; a
    })
    val regMax = udaf(new ByteMaxAgg(m))
    var regs = adj.select(col("node")).distinct()
      .select(col("node"),
        pack(Sketches.hllRegister(col("node"), p),
          Sketches.hllRank(col("node"), p)).as("ball"))
      .localCheckpoint(true)
    for (_ <- 1 to k) {
      regs = regs
        .union(adj.join(regs.withColumnRenamed("node", "nbr"), "nbr")
          .select(col("node"), col("ball")))
        .groupBy(col("node")).agg(regMax(col("ball")).as("ball"))
        .localCheckpoint(true)
    }
    // Unpack ONCE (nodes rows, not per round) to the sparse
    // (node, reg, maxrho) rows hllFinalize consumes — identical to
    // the rows the row-per-register evolution produced.
    val unpack = udf((b: Array[Byte]) =>
      b.iterator.zipWithIndex
        .collect { case (v, i) if v > 0 => (i.toLong, v.toInt) }.toSeq)
    val sparse = regs
      .select(col("node"), explode(unpack(col("ball"))).as("rr"))
      .select(col("node"), col("rr._1").as("reg"), col("rr._2").as("maxrho"))
    Sketches.hllFinalize(sparse, Seq("node"), p)
      .withColumnRenamed("nd_estimate", "ball_estimate")
  }

  /** Element-wise byte max over fixed-width register blocks —
    * HyperBall's sketch-space set union ([[hyperBall]]). Ranks are
    * small positives, so signed comparison IS the register max; the
    * buffer mutates in place (one array per group, no per-row
    * allocation). */
  private final class ByteMaxAgg(m: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](m)
    def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (a(i) > b(i)) b(i) = a(i); i += 1 }
      b
    }
    def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = reduce(x, y)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** Synchronous label-propagation community detection — the graph
    * tier's grouping lens beside q47's connectivity (components join
    * everything reachable; communities stop where the link density
    * does). Every node starts labeled with itself; each ROUND every
    * node simultaneously adopts the most frequent label among its
    * neighbors, ties broken by the SMALLEST label — the deterministic
    * synchronous variant of Raghavan et al.'s LPA. Fixed `rounds`
    * keeps the op oracle-replayable (each round unrolls to one
    * neighbor-label join + one census + one arg-min, the q60/q114
    * bounded-recurrence pattern); determinism needs no RNG because
    * both the schedule (synchronous) and the tie-break (min label)
    * are total.
    *
    * Scale shape per round: one equi-join of the label table onto the
    * symmetric adjacency (shuffle on node id), one map-side-combinable
    * (node, label) census, then the arg-min as `min(struct(-cnt,
    * label))` — an AGGREGATE, not a window, so no per-node sort and
    * no skew cliff on a hub node; label state localCheckpoint'd per
    * round (the q47/q60 lineage lesson). Isolated nodes cannot occur
    * (nodes are defined as edge endpoints); a node keeps its own
    * label only by winning the census through a neighbor. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int, maxKernelEdges: Int = 4000000): DataFrame = {
    require(rounds >= 0, "rounds must be nonnegative")
    val pairs = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    // Size-routed strategy (r18, the q105 kernel convention): up to
    // `maxKernelEdges` canonical edges the synchronous rounds run as
    // one broadcast-CSR kernel — each declarative round is a
    // join + two aggregates + a checkpoint, and at sub-second scale
    // those per-round jobs ARE the cost. Above the bound, the
    // declarative rounds below run unchanged at any scale. Raw-count
    // routing (r18 opt pass, see [[triangleCount]]): the probe is a
    // map-side-partial count over the scan — no distinct shuffle, no
    // checkpoint on the kernel path — and the kernel dedups exactly
    // in dense-id space ([[densePairs]]); rows reach the driver only
    // after the guard admits them (r18 review).
    if (pairs.count() <= maxKernelEdges)
      return labelPropKernel(edges.sparkSession, pairs.collect(), rounds)
    val ue = pairs.distinct().localCheckpoint(true)
    val adj = ue.select(col("u").as("node"), col("v").as("nbr"))
      .union(ue.select(col("v").as("node"), col("u").as("nbr")))
    var labels = adj.select(col("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      labels = adj
        .join(labels.select(col("node").as("nbr"), col("label")), "nbr")
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("best"))
        .select(col("node"), col("best.l").as("label"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Broadcast-CSR label-propagation kernel: EXACTLY the declarative
    * rounds' semantics — synchronous updates, per-node best =
    * (max neighbor-label count, then MIN label), the node's own
    * label never voting — over a dense symmetric adjacency. Labels
    * are always node ids, so counting uses a dense scratch array
    * with a stamp trick (O(deg) per node, no per-node allocation).
    * Rounds are O(m) each on the guard-bounded graph (the
    * fitCorpusTriage driver-fold convention); the result emits
    * distributed via broadcast, never as a driver-built frame. */
  private def labelPropKernel(spark: org.apache.spark.sql.SparkSession,
                              rows: Array[org.apache.spark.sql.Row],
                              rounds: Int): DataFrame = {
    import spark.implicits._
    val (nodes, eu, ev) = densePairs(rows)
    val n = nodes.length
    val m = eu.length
    val deg = new Array[Int](n)
    locally {
      var i = 0
      while (i < m) { deg(eu(i)) += 1; deg(ev(i)) += 1; i += 1 }
    }
    val ptr = new Array[Int](n + 1)
    locally { var i = 0; while (i < n) { ptr(i + 1) = ptr(i) + deg(i); i += 1 } }
    val adj = new Array[Int](2 * m)
    locally {
      val fill = java.util.Arrays.copyOf(ptr, n)
      var i = 0
      while (i < m) {
        adj(fill(eu(i))) = ev(i); fill(eu(i)) += 1
        adj(fill(ev(i))) = eu(i); fill(ev(i)) += 1
        i += 1
      }
    }
    // lab holds DENSE label indices (labels are always node ids).
    var lab = Array.tabulate(n)(identity)
    val cnt = new Array[Int](n)
    // Long stamps: an Int counter wraps after 2^32 node-visits
    // (n·rounds is caller-controlled) and a wrapped stamp would
    // silently resume a stale count (r18 review).
    val stamp = new Array[Long](n)
    var curStamp = 0L
    var r = 0
    while (r < rounds) {
      val next = new Array[Int](n)
      var v = 0
      while (v < n) {
        curStamp += 1
        var bestLab = -1; var bestCnt = 0
        var e = ptr(v)
        while (e < ptr(v + 1)) {
          val l = lab(adj(e))
          if (stamp(l) != curStamp) { stamp(l) = curStamp; cnt(l) = 0 }
          cnt(l) += 1
          // max count, then min label (dense order = node-id order).
          if (cnt(l) > bestCnt || (cnt(l) == bestCnt && l < bestLab)) {
            bestCnt = cnt(l); bestLab = l
          }
          e += 1
        }
        next(v) = if (bestLab >= 0) bestLab else lab(v)
        v += 1
      }
      lab = next
      r += 1
    }
    val labIds = Array.tabulate(n)(i => nodes(lab(i)))
    val bc = spark.sparkContext.broadcast((nodes, labIds))
    spark.range(0, n.toLong).as[Long].map { i =>
      val (bn, bl) = bc.value
      (bn(i.toInt), bl(i.toInt))
    }.toDF("node", "label")
  }

  /** Link prediction by neighborhood overlap: for every NON-adjacent
    * node pair with at least one common neighbor, the
    * common-neighbor count and Jaccard coefficient
    * `cn / (deg(u) + deg(v) − cn)` — the classic "predict the
    * missing edge" scores (Liben-Nowell & Kleinberg) behind
    * recommend-a-connection and knowledge-graph completion.
    * Adamic-Adar is deliberately absent: its ln(deg) term is the one
    * transcendental that would break cross-engine exactness, and on
    * the pair set emitted here it is a monotone re-weighting
    * consumers can apply downstream.
    *
    * Scale shape: candidate pairs come from the WEDGE census — one
    * self-join of the symmetric adjacency on the midpoint with an
    * `a < b` orientation cut, then a map-side-combinable (a, b)
    * count; existing edges leave via a left-anti join and degrees
    * attach by two equi-joins on keys-sized censuses. The wedge set
    * is Σ deg(m)² — the q105 triangle bound — and a hub node
    * explodes it, so `maxDegree` drops midpoints above a cap
    * (fail-soft, the standard web-graph mitigation; default keeps
    * everything and is exact). Jaccard is ONE correctly-rounded
    * division of exactly-converted longs, so the frame hash-gates. */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
                     maxDegree: Long = Long.MaxValue): DataFrame = {
    require(maxDegree > 0, "maxDegree must be positive")
    val ue = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    val adj = ue.select(col("u").as("node"), col("v").as("nbr"))
      .union(ue.select(col("v").as("node"), col("u").as("nbr")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val mids =
      if (maxDegree == Long.MaxValue) adj
      else adj.join(deg.filter(col("deg") <= maxDegree).select("node"), "node")
    // Pre-spread the streamed wedge side (the q129/kHopReach lesson):
    // a broadcast wedge join otherwise runs the deg²-expanded pair
    // stream and its census partials on the checkpoint's few
    // AQE-coalesced partitions.
    val width = edges.sparkSession.sessionState.conf.numShufflePartitions
    val cn = mids.select(col("node"), col("nbr").as("a"))
      .repartition(width, col("node"))
      .join(mids.select(col("node"), col("nbr").as("b")), "node")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
    cn.join(ue, cn("a") === ue("u") && cn("b") === ue("v"), "left_anti")
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("__db")), "b")
      .select(col("a").as("u"), col("b").as("v"), col("cn"),
        (col("cn").cast("double") /
          (col("__da").cast("double") + col("__db").cast("double")
            - col("cn").cast("double"))).as("jaccard"))
  }

  /** ADAMIC-ADAR link prediction — [[linkPrediction]]'s
    * common-neighbor count with the weighting that made the metric
    * famous: a shared HUB says little (everyone passes through it),
    * a shared RARE neighbor says a lot, so each common neighbor w
    * contributes `1/log(deg w)` instead of 1 (Adamic & Adar 2003).
    * The reciprocal log is exact fixed-point: `2²⁴ DIV flog2q(deg)`
    * with the 1/16-bit integer log2 kernel — a common neighbor has
    * degree ≥ 2 by construction, so the divisor is always ≥ 16 —
    * and the pair score is an exact long sum, so the frame
    * hash-gates where a float 1/ln could not.
    *
    * Same scale shape as [[linkPrediction]]: wedge enumeration
    * through mid-nodes with the optional degree cap (a hub's wedge
    * set is quadratic in its degree — the cap is the guard), one
    * census aggregate, anti-join against existing edges. */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 maxDegree: Long = Long.MaxValue): DataFrame = {
    require(maxDegree > 0, "maxDegree must be positive")
    val ue = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    val adj = ue.select(col("u").as("node"), col("v").as("nbr"))
      .union(ue.select(col("v").as("node"), col("u").as("nbr")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val mids =
      (if (maxDegree == Long.MaxValue) adj.join(deg, "node")
       else adj.join(deg.filter(col("deg") <= maxDegree), "node"))
        // Degree-1 leaves never form a wedge (no pair of distinct
        // neighbors), but the projection is evaluated eagerly on
        // every adjacency row — flog2q(1) = 0 would divide by zero,
        // so the guard zeroes the never-used weight.
        .withColumn("__w", expr(
          s"CAST(CASE WHEN deg >= 2 THEN 16777216 DIV ${
            graft.operators.Curation.flog2qSql("deg")} ELSE 0 END AS BIGINT)"))
    // Pre-spread the streamed wedge side (the q129/kHopReach lesson).
    val width = edges.sparkSession.sessionState.conf.numShufflePartitions
    val aa = mids.select(col("node"), col("nbr").as("a"), col("__w"))
      .repartition(width, col("node"))
      .join(mids.select(col("node"), col("nbr").as("b")), "node")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"), sum("__w").as("aa_fp"))
    aa.join(ue, aa("a") === ue("u") && aa("b") === ue("v"), "left_anti")
      .select(col("a").as("u"), col("b").as("v"), col("cn"), col("aa_fp"))
  }

  /** HITS hubs & authorities (Kleinberg) — the DIRECTED prestige
    * lens beside [[pageRank]]'s random surfer: a node is a good
    * authority if good hubs point AT it, a good hub if it points at
    * good authorities. Runs the mutual recurrence for a fixed number
    * of rounds from h₀ = 1: aᵣ = Aᵀhᵣ₋₁ then hᵣ = A·aᵣ —
    * UNNORMALIZED, so every value is an exact integer (the
    * per-round L2 normalization of textbook HITS is a positive
    * scalar: it never changes the RANKING, which is the quantity
    * consumers use, and dropping it removes the one float/sqrt step
    * that would break cross-engine exactness). Nodes with no
    * in-edges score auth 0; no out-edges, hub 0.
    *
    * Magnitudes grow ~(mean degree)^(2·rounds): with degree d and n
    * nodes the largest entry is bounded by n·d^(2·rounds), so Long
    * overflow needs d^(2·rounds) ≈ 9·10¹⁸/n — at web-graph degrees
    * run 2-3 rounds (the classic choice; convergence of the RANKING
    * is fast) or rescale between rounds upstream.
    *
    * Scale shape per round: one equi-join of the score table onto
    * the edge list on the scoring endpoint + one map-side-combinable
    * sum — same exchange profile as a PageRank round — then a
    * node-complete left join (broadcast-eligible censuses), state
    * localCheckpoint'd per round (the q47/q60 lineage lesson). No
    * windows, no driver-side state. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    def complete(scores: DataFrame, c: String): DataFrame =
      nodes.join(scores, Seq("node"), "left")
        .select(col("node"), coalesce(col(c), lit(0L)).as(c))
        .localCheckpoint(true)
    var hub = nodes.withColumn("h", lit(1L))
    var auth = nodes.withColumn("a", lit(0L))
    for (_ <- 1 to rounds) {
      auth = complete(
        e.join(hub.select(col("node").as("src"), col("h")), "src")
          .groupBy(col("dst")).agg(sum(col("h")).as("a"))
          .select(col("dst").as("node"), col("a")), "a")
      hub = complete(
        e.join(auth.select(col("node").as("dst"), col("a")), "dst")
          .groupBy(col("src")).agg(sum(col("a")).as("h"))
          .select(col("src").as("node"), col("h")), "h")
    }
    hub.join(auth, Seq("node"))
      .select(col("node"), col("h").as("hub"), col("a").as("auth"))
  }

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampNum: Long = 85L, dampDen: Long = 100L,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0, "iters must be nonnegative")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen, "damping must be in [0, 1]")
    require(scale > 0, "scale must be positive")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank_scaled", lit(0L))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // Static across iterations: every edge already carries its
    // source's out-degree, so the loop never re-joins the degree
    // table.
    val edgesDeg = e.join(deg, "src").localCheckpoint(true)
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)
    var ranks = nodes.withColumn("rank_scaled", lit(scale / n))
    for (i <- 1 to iters) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        // `div`, not `/`: Column./ on longs is DOUBLE division, which
        // would reintroduce the float rounding this operator exists
        // to avoid.
        .select(col("dst"),
          expr(s"($dampNum * rank_scaled) div ($dampDen * outdeg)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("s"), lit(0L))).as("rank_scaled"))
      // Cut lineage every OTHER round (and always before returning):
      // the plan doubles per uncut round, so a cadence of 2 caps the
      // depth at two join/agg layers while halving the eager
      // materialization barriers — which, not data volume, dominate
      // wall time between checkpoints.
      if (i % 2 == 0 || i == iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** Personalized PageRank / TrustRank (Gyöngyi et al.): the
    * [[pageRank]] recurrence with teleport restricted to a SEED set —
    * rank mass flows out from trusted nodes only, so the score reads
    * "how reachable from the whitelist", the standard spam/quality
    * signal over a crawl host graph (seed a few hand-vetted hosts,
    * damp trust along links, threshold the tail). Same integer
    * fixed-point arithmetic as [[pageRank]] (every step is exact
    * `div`/`sum` on scaled longs — deterministic, hash-gateable);
    * only the base term changes: `(1−d)·scale/|S|` on seeds, 0
    * elsewhere, initial mass `scale/|S|` on seeds. Seeds not present
    * in the graph are ignored (they can neither receive nor emit
    * mass); at least one must survive.
    *
    * Scale shape: identical to [[pageRank]] — edges carry their
    * out-degree once, each round is one equi-join + one
    * map-side-combinable sum, lineage cut every other round; the
    * seed flag is one keys-sized broadcast-eligible join, paid once
    * outside the loop. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String, iters: Int,
                           dampNum: Long = 85L, dampDen: Long = 100L,
                           scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0, "iters must be nonnegative")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen, "damping must be in [0, 1]")
    require(scale > 0, "scale must be positive")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val flagged = nodes.join(
        seeds.select(col(seedCol).cast("long").as("node")).distinct()
          .withColumn("__s", lit(1L)),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0L)).as("__s"))
      .localCheckpoint(true)
    val ns = flagged.filter(col("__s") === 1L).count()
    require(ns > 0, "personalizedPageRank: no seed node exists in the graph")
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesDeg = e.join(deg, "src").localCheckpoint(true)
    val base = ((dampDen - dampNum) * scale) / (dampDen * ns)
    def seedTerm(perSeed: Long): Column =
      when(col("__s") === 1L, lit(perSeed)).otherwise(lit(0L))
    var ranks = flagged.select(col("node"),
      seedTerm(scale / ns).as("trust_scaled"))
    for (i <- 1 to iters) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          expr(s"($dampNum * trust_scaled) div ($dampDen * outdeg)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = flagged
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (seedTerm(base) + coalesce(col("s"), lit(0L))).as("trust_scaled"))
      if (i % 2 == 0 || i == iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
}
