package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.HaversineDist
import Q._

/** SURVEY §2.10 — spatio-temporal mining over derived pseudo-coordinates
  * (the testdata has no lat/lon; both engines derive them with identical
  * integer-exact arithmetic, FIXTURES.md).
  *
  * Scale design: every trajectory op is one window pass partitioned by
  * user (shuffle once on user_id, no self-joins); containment/radius are
  * scan-side predicates; the grid heatmap is a hash aggregate on derived
  * cell keys — the same cell keys that at 100 TB become the physical
  * partition column for spatial pruning; kNN at this scale is a
  * TakeOrderedAndProject (per-partition heap), with grid-prune as the
  * documented scale path; trajectory similarity reduces each user to a
  * fixed-size visited-cell bitmap (one aggregate) and compares signatures
  * with broadcast codegen'd popcount — no candidate-pair shuffle.
  *
  * FP parity: per-segment haversine values may differ from DuckDB by libm
  * ulps, so consumers (a) sum through DECIMAL(18,4) where a 1e-12 wobble
  * cannot cross a rounding boundary except with ~1e-8 probability, and (b)
  * never compare per-row quotients with tiny denominators — per-user speed
  * ratios are taken over aggregate totals, and the max segment speed is
  * rounded to integer km/h. */
object Geo extends QueryGroup {

  // Executed-round attribution for Bench's iterations line: the binding
  // lives HERE, next to the key declarations, so adding an iterative key
  // never requires a Bench edit (operators/LastIterations).
  locally {
    import graft.operators.LastIterations.register
    register("m_graph_pagerank")(graft.operators.PageRank.lastIterations)
    register("m_graph_wpagerank")(graft.operators.PageRank.lastIterations)
    register("m_graph_lp")(graft.operators.LabelProp.lastIterations)
    register("m_graph_ppr")(graft.operators.Ppr.lastIterations)
    register("m_graph_kcore")(graft.operators.KCore.lastIterations)
    register("q_graph_bfs")(graft.operators.Bfs.lastIterations)
    register("m_graph_sssp")(graft.operators.Sssp.lastIterations)
  }

  /** Co-traveler pair memo: m_graph_pagerank and q_graph_degree read the
    * SAME coTravelers(cell=20°, minHours=2) pair set — one bucket join per
    * (session, sfDir, params) behind a lazy checkpoint instead of one per
    * key ([[graft.SessionMemo]]; keyed by VALUE since each call site builds
    * a fresh pts() plan, so DataFrame identity would never hit). */
  private val convoyMemo = new graft.SessionMemo[(String, Double, Int), DataFrame]

  private def coTravelerPairs(s: SparkSession, dir: String,
                              cellDeg: Double, minHours: Int): DataFrame =
    convoyMemo.getOrCompute(s, (dir, cellDeg, minHours)) {
      graft.operators.Convoy.coTravelers(pts(s, dir), cellDeg, minHours)
        .localCheckpoint(eager = false)
    }

  /** Derived pseudo-coordinates — integer-exact, identical text in SQL. */
  private def withGeo(df: DataFrame): DataFrame = df
    .withColumn("lat", ((col("event_id") * 37L)  % 1700L) / 10.0 - 85.0)
    .withColumn("lon", ((col("event_id") * 131L) % 3600L) / 10.0 - 180.0)

  private def pts(s: SparkSession, dir: String): DataFrame = {
    HaversineDist.register(s)
    withGeo(t(s, dir, "events")).withColumn("ts_us", unix_micros(col("ts")))
  }

  private def hv(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    HaversineDist.haversineKm(lat1, lon1, lat2, lon2)

  private val trajW = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))

  /** Consecutive-point segments per user: (user_id, event_id, ts_us, seg_km, dt_us). */
  private def segments(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .withColumn("plat", lag(col("lat"), 1).over(trajW))
      .withColumn("plon", lag(col("lon"), 1).over(trajW))
      .withColumn("pts_us", lag(col("ts_us"), 1).over(trajW))
      .withColumn("seg_km", hv(col("plat"), col("plon"), col("lat"), col("lon")))
      .withColumn("dt_us", col("ts_us") - col("pts_us"))

  /** Shared triangle machinery over the memoized co-traveler pair set:
    * (closed a<b<c triangle triples, endpoint-union degree frame) — one
    * definition for q_graph_triangles AND q_graph_clustcoef, so a fix to
    * the orientation or the pair substrate can never desynchronize the
    * two keys' graphs. */
  private def triangleFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = coTravelerPairs(s, dir, cellDeg = 20.0, minHours = 2)
      .select(col("u1"), col("u2"))
    val paths = e.as("ab").join(e.as("bc"), col("ab.u2") === col("bc.u1"))
      .select(col("ab.u1").as("a"), col("ab.u2").as("b"), col("bc.u2").as("c"))
    val tri = paths.join(e.as("ac"),
      col("a") === col("ac.u1") && col("c") === col("ac.u2"))
      .select(col("a"), col("b"), col("c"))
    val deg = e.select(col("u1").as("u")).unionAll(e.select(col("u2").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).as("d"))
    (tri, deg)
  }

  /** Convex CCW pentagon for q_geo_polygon, as (lon, lat) vertices — all
    * integral so every edge delta is an exact double literal. Both the
    * Spark predicate and the oracle SQL are generated from THIS list, so
    * the two engines can never drift onto different geometries. */
  private val polygonVerts: Seq[(Double, Double)] =
    Seq((-60.0, -35.0), (45.0, -50.0), (95.0, 10.0), (20.0, 55.0), (-75.0, 30.0))

  /** Edges as (x1, y1, dx, dy) with the wrap-around edge included. */
  private val polygonEdges: Seq[(Double, Double, Double, Double)] =
    polygonVerts.zip(polygonVerts.tail :+ polygonVerts.head).map {
      case ((x1, y1), (x2, y2)) => (x1, y1, x2 - x1, y2 - y1)
    }
  private val polyLonMin = polygonVerts.map(_._1).min
  private val polyLonMax = polygonVerts.map(_._1).max
  private val polyLatMin = polygonVerts.map(_._2).min
  private val polyLatMax = polygonVerts.map(_._2).max

  /** Oracle mirror of the half-plane conjunction, identical literals. */
  private val polygonSqlPred: String =
    polygonEdges.map { case (x1, y1, dx, dy) =>
      f"($dx%.1f * (lat - ($y1%.1f)) - $dy%.1f * (lon - ($x1%.1f)) >= 0.0)"
    }.mkString("\n    AND ")

  // ---- oracle-side shared SQL ----------------------------------------------

  private val ptsCte =
    """WITH pts AS (
      |  SELECT event_id, user_id, event_type, value,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    ((event_id * 37) % 1700) / 10.0 - 85.0 AS lat,
      |    ((event_id * 131) % 3600) / 10.0 - 180.0 AS lon
      |  FROM events)""".stripMargin

  private val segCte = ptsCte +
    s""",
       |seg AS (
       |  SELECT user_id, event_id, ts_us,
       |    CASE WHEN plat IS NULL THEN NULL
       |         ELSE ${HaversineDist.oracleSql("plat", "plon", "lat", "lon")} END AS seg_km,
       |    ts_us - pts_us AS dt_us
       |  FROM (
       |    SELECT user_id, event_id, ts_us, lat, lon,
       |      lag(lat, 1) OVER w AS plat, lag(lon, 1) OVER w AS plon,
       |      lag(ts_us, 1) OVER w AS pts_us
       |    FROM pts
       |    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)) t)""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q_geo_haversine" -> ((s, dir) => {
      import s.implicits._
      // Output at 0.1 km: a single per-segment libm-ulp wobble can flip one
      // DECIMAL(18,4) cast by 1e-4 (observed once at sf0.1 across 100k
      // segments), and round(3) of the sum sits close enough to see it;
      // round(1) needs the sum within 1e-4 of a 0.05 boundary ON TOP of a
      // flip — combined probability ~1e-6 per group at sf0.1.
      segments(s, dir)
        .groupBy($"user_id")
        .agg(round(dsum($"seg_km", 4), 1).as("track_km"),
             count($"seg_km").as("n_segs"))
        .orderBy($"user_id")
    }),

    "q_geo_bbox" -> ((s, dir) => {
      import s.implicits._
      pts(s, dir)
        .filter($"lat".between(-30.0, 30.0) && $"lon".between(-90.0, 90.0))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_inside"))
        .orderBy($"event_type")
    }),

    // Point-in-polygon containment (STARK `contains` with a real geometry,
    // not just the axis-aligned bbox): a convex CCW pentagon tested by the
    // half-plane cross-product conjunction — inside ⟺ the point sits on
    // the left of every edge. Both engines evaluate the SAME expression
    // tree over the same derived doubles (edge deltas are integral, so the
    // literals are exact), making the per-row verdict bit-deterministic.
    // The sargable bbox conjunct runs FIRST: at 100 TB with stored
    // coordinates it reaches the parquet scan as a min/max-prunable range
    // predicate and the 10-flop exact test only touches bbox survivors.
    // Convex-only is a declared bound — a concave polygon decomposes into
    // convex pieces OR'd together with the same per-piece plan.
    "q_geo_polygon" -> ((s, dir) => {
      import s.implicits._
      val inPoly = polygonEdges.map { case (x1, y1, dx, dy) =>
        (lit(dx) * ($"lat" - lit(y1)) - lit(dy) * ($"lon" - lit(x1))) >= 0.0
      }.reduce(_ && _)
      pts(s, dir)
        .filter($"lon".between(polyLonMin, polyLonMax) &&
                $"lat".between(polyLatMin, polyLatMax))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_bbox"),
             sum(when(inPoly, 1L).otherwise(0L)).as("n_inside"))
        .withColumn("inside_frac",
          round($"n_inside".cast("double") / $"n_bbox".cast("double"), 4))
        .orderBy($"event_type")
    }),

    // HaversineRadiusPruning rewrites the radius test into
    // bbox-conjuncts + radius (sargable range predicates run before the
    // trig; on stored lat/lon columns they'd reach the parquet scan).
    "q_geo_radius" -> ((s, dir) => {
      import s.implicits._
      graft.plans.HaversineRadiusPruning.install(s)
      pts(s, dir)
        .filter(hv($"lat", $"lon", lit(48.85), lit(2.35)) < 500.0)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_close"))
        .orderBy($"user_id")
    }),

    "q_geo_grid" -> ((s, dir) => {
      import s.implicits._
      pts(s, dir)
        .groupBy(floor($"lat" / 10.0).cast("long").as("cell_lat"),
                 floor($"lon" / 10.0).cast("long").as("cell_lon"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"cell_lat", $"cell_lon")
        .limit(20)
    }),

    // Origin–destination matrix: per (user, day), the first and last grid
    // cell visited → trip counts per OD pair — the classic telemetry
    // mobility product. One (user, day) shuffle feeds both window passes
    // and the rank-1 filter; the OD aggregate then shuffles on the pair
    // key. At 100 TB the day column is the natural partition column, so
    // the window pass is partition-local.
    "q_geo_od" -> ((s, dir) => {
      import s.implicits._
      val wOrd = Window.partitionBy($"user_id", $"day").orderBy($"ts_us", $"event_id")
      val wAll = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      pts(s, dir)
        .withColumn("day", expr("ts_us div 86400000000"))
        .withColumn("cell", concat_ws(":",
          floor($"lat" / 10.0).cast("long"), floor($"lon" / 10.0).cast("long")))
        .withColumn("origin", first($"cell").over(wAll))
        .withColumn("dest", last($"cell").over(wAll))
        .withColumn("rn", row_number().over(wOrd))
        .filter($"rn" === 1)
        .groupBy($"origin", $"dest")
        .agg(count(lit(1)).as("n_trips"))
        .orderBy($"origin", $"dest")
    }),

    // Exact kNN on the grid index with RING GROWTH (r8) — the full-scan
    // plan this key declared through r7 is gone: candidates come from the
    // probe cell's (2r+1)² box starting at r=1, widened until the kth
    // candidate's distance is certified inside the ring's safe radius (see
    // [[graft.operators.GridKnn]]), so the key is exact at ANY density —
    // the certificate, not a measured fixture, carries correctness. Oracle
    // stays the brute-force full scan: hash equality proves the pruned
    // search loses no neighbour; GeoSpec additionally plants a sparse
    // neighborhood that FORCES ring growth and pins exactness there.
    "q_geo_knn" -> ((s, dir) =>
      graft.operators.GridKnn.topK(pts(s, dir), pLat = 10.0, pLon = 20.0,
        cellDeg = 10.0, k = 5)._1),

    // Index-backed kNN: the grid layout IS the index. Candidates are
    // restricted to the probe cell's 5×5 (ring=2) 10° neighborhood via a
    // SARGABLE lat/lon range predicate — at 100 TB, on the cell-partitioned
    // layout PlanSpec demonstrates, that predicate prunes partition
    // DIRECTORIES (and row groups within the kept ones) before any scoring;
    // TakeOrderedAndProject then heaps only the pruned candidates, so the
    // probe reads 25 cells of the planet, not all of it. Exactness: the 5th
    // neighbour's distance must stay inside the ring's safe radius (min
    // distance from probe to ring boundary, ≈2190 km here; at sf0.001 the
    // 5th neighbour sits at ~1190 km, which is why ring=1 with its 1094 km
    // bound was NOT taken) — pinned by a GeoSpec property plus the
    // UNCHANGED brute-force oracle (hash equality means pruned ≡ full
    // scan). Repeated/low-latency lookups reuse the same layout with a
    // different probe cell — no all-points pass per probe, the
    // TakeOrderedAndProject-only weakness this key replaces.
    "q_geo_knn_grid" -> ((s, dir) => {
      import s.implicits._
      val (pLat, pLon, cell, ring) = (10.0, 20.0, 10.0, 2)
      val latLo = (math.floor(pLat / cell) - ring) * cell
      val latHi = (math.floor(pLat / cell) + ring + 1) * cell
      val lonLo = (math.floor(pLon / cell) - ring) * cell
      val lonHi = (math.floor(pLon / cell) + ring + 1) * cell
      pts(s, dir)
        .filter($"lat" >= latLo && $"lat" < latHi &&
                $"lon" >= lonLo && $"lon" < lonHi)
        .withColumn("dist_km", r3(hv($"lat", $"lon", lit(pLat), lit(pLon))))
        .select($"event_id", $"dist_km")
        .orderBy($"dist_km", $"event_id")
        .limit(5)
    }),

    // Two-relation ε-distance spatial join (the STARK join surface that
    // was missing beside the SELF-join forms: convoy, DBSCAN candidates):
    // event points ⋈ depot points (a second, differently-derived point
    // set from orders) within 200 km. Candidates come from 4° grid-cell
    // buckets — the depot side (small) explodes its 3×3 cell neighborhood
    // and the join is a pure EQUI-join on (cell_lat, cell_lon), never a
    // cartesian/BNL (PlanSpec asserts); exact haversine then verifies.
    // Correctness of the bucket scheme: both relations carry a declared
    // |lat| ≤ 60° service-area filter, so cos(lat) ≥ 0.5 and a 200 km
    // pair is ≤ 1.80° apart in lat and ≤ 3.61° in lon — strictly inside
    // one 4° cell step in each axis. Lon cells live on a mod-90 ring so
    // antimeridian-adjacent pairs (Δlon ≈ 360°, true distance small —
    // haversine wraps correctly) stay candidates. At 100 TB both sides
    // shuffle on the cell key only (here the depot side broadcasts); the
    // oracle is the full O(n·m) exact distance join, so hash equality
    // proves the pruned candidate set loses no pair.
    "q_geo_join" -> ((s, dir) => {
      import s.implicits._
      val ev = withGeo(t(s, dir, "events"))
        .select($"event_id", $"user_id", $"lat", $"lon")
      val dep = t(s, dir, "orders")
        .filter($"o_orderkey" % 101 === 7)
        .select($"o_orderkey".as("depot_id"),
          ((($"o_orderkey" * 59L) % 1700L) / 10.0 - 85.0).as("d_lat"),
          ((($"o_orderkey" * 211L) % 3600L) / 10.0 - 180.0).as("d_lon"))
      graft.operators.DistanceJoin
        .within(ev, "lat", "lon", dep, "d_lat", "d_lon",
          epsKm = 200.0, cellDeg = 4.0, maxAbsLat = 60.0)
        .groupBy($"depot_id")
        .agg(count(lit(1)).as("n_events"),
             countDistinct($"user_id").as("n_users"),
             r3(min($"km")).as("min_km"))
        .orderBy($"depot_id")
    }),

    "q_traj_speed" -> ((s, dir) => {
      import s.implicits._
      val seg = segments(s, dir)
        .filter($"dt_us" > 0)
        .withColumn("speed_kmh", $"seg_km" / ($"dt_us" / 3.6e9))
      seg.groupBy($"user_id")
        .agg(count(lit(1)).as("n_segs"),
             // round(1), not round(3): see q_geo_haversine — a one-segment
             // cast flip must not be visible in the output rounding.
             round(dsum($"seg_km", 4), 1).as("total_km"),
             r2(dsum($"seg_km", 4) / (sum($"dt_us") / 3.6e9)).as("avg_speed_kmh"),
             round(max($"speed_kmh"), 0).cast("long").as("max_speed_kmh"),
             count(when($"speed_kmh" > 1000.0, 1)).as("n_speeding"))
        .orderBy($"user_id")
    }),

    // Stay-points: maximal runs of consecutive points each ≤3000 km from the
    // previous; a run is a "stay" if ≥3 points and ≥10 min span.
    "q_traj_stay" -> ((s, dir) => {
      import s.implicits._
      val wRun = trajW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runs = segments(s, dir)
        .withColumn("new_run",
          when($"seg_km".isNull || $"seg_km" > 3000.0, 1L).otherwise(0L))
        .withColumn("rid", sum($"new_run").over(wRun))
        .groupBy($"user_id", $"rid")
        .agg(count(lit(1)).as("n_pts"),
             (max($"ts_us") - min($"ts_us")).as("span_us"))
      runs.groupBy($"user_id")
        .agg(count(lit(1)).as("n_runs"),
             count(when($"n_pts" >= 3 && $"span_us" >= 600000000L, 1)).as("n_stays"))
        .orderBy($"user_id")
    }),

    // Trajectory similarity: exact Jaccard over visited 10° grid-cell sets.
    // The cell universe is fixed (19×37 = 703 ids over the closed GPS domain
    // lat ∈ [-90,90], lon ∈ [-180,180] — the 37-wide stride gives the
    // boundary points lat=90 / lon=180 their own cells instead of aliasing
    // into the next row), so each user's set is a 704-bit bitmap: 11
    // bit_or-aggregated longs — one signature row per user — then a
    // broadcast pair scan with codegen'd AND/popcount. This
    // replaces the shared-cell equi-join, which at bench density (every
    // user visits most cells) degenerated to ~all-pairs × shared-cells
    // shuffle rows. Per-user state is O(|grid|/8) bytes regardless of data
    // volume; for unbounded user counts the documented scale path is
    // MinHash-LSH over the same cell sets (m_dedup_minhash machinery).
    "q_traj_sim" -> ((s, dir) => {
      import s.implicits._
      val W = 11 // ceil(703 / 64)
      // cid ∈ [0, 702]: lat row (floor(lat/10)+9) ∈ [0,18], lon col
      // (floor(lon/10)+18) ∈ [0,36] on the closed domain; out-of-domain
      // input would still alias, so the domain assumption lives here.
      val cid = ((floor($"lat" / 10.0) + 9L) * 37L + (floor($"lon" / 10.0) + 18L)).cast("int")
      val cells = pts(s, dir).select($"user_id", cid.as("cid")).distinct()
      val words = (0 until W).map(w =>
        expr(s"bit_or(CASE WHEN cid div 64 = $w THEN shiftleft(1L, cid % 64) ELSE 0L END)")
          .as(s"w$w"))
      val bm = cells.groupBy($"user_id").agg(words.head, words.tail: _*)
      val lhs = bm.select($"user_id".as("u1") +: (0 until W).map(w => col(s"w$w").as(s"a$w")): _*)
      val rhs = bm.select($"user_id".as("u2") +: (0 until W).map(w => col(s"w$w").as(s"b$w")): _*)
      val nInter = (0 until W).map(w => expr(s"bit_count(a$w & b$w)")).reduce(_ + _)
      val n1 = (0 until W).map(w => expr(s"bit_count(a$w)")).reduce(_ + _)
      val n2 = (0 until W).map(w => expr(s"bit_count(b$w)")).reduce(_ + _)
      lhs.join(broadcast(rhs), $"u1" < $"u2")
        .withColumn("n_inter", nInter.cast("long"))
        .withColumn("n1", n1.cast("long"))
        .withColumn("n2", n2.cast("long"))
        .filter($"n_inter" > 0) // the equi-join shape never saw 0-overlap pairs
        .select($"u1", $"u2",
                r4($"n_inter" * lit(1.0) / ($"n1" + $"n2" - $"n_inter")).as("jaccard"))
        .orderBy($"jaccard".desc, $"u1", $"u2")
        .limit(10)
    }),

    // Convoy/co-travel detection (grid-coarse): pairs of users observed
    // in the same 20° cell during the same hour, in ≥3 distinct hours
    // (cell size chosen so the derived lattice actually co-locates).
    // Bucket-local self-join; hot-bucket skew story in [[Convoy]]'s
    // scaladoc, pinned by GeoSpec's hot-bucket property.
    "q_traj_convoy" -> ((s, dir) =>
      coTravelerPairs(s, dir, cellDeg = 20.0, minHours = 3)),

    // Influence ranking over the co-traveler graph: PageRank on the
    // (minHours ≥ 2) co-travel pairs, top-10 users by rank — the "central
    // figure in a movement network" query of a trajectory-mining engine.
    // Ranks rounded to 6 decimals (noise floor ~1e-15), ties by user_id.
    // No SQL oracle (iterative damped ranking has no DuckDB analog at
    // parity precision); PageRankSpec pins node-wise equality to a
    // driver-side reference iteration plus the Σrank = 1 invariant.
    "m_graph_pagerank" -> ((s, dir) => {
      import s.implicits._
      val pairs = coTravelerPairs(s, dir, cellDeg = 20.0, minHours = 2)
      val edges = pairs.select($"u1".as("src"), $"u2".as("dst"))
        .unionAll(pairs.select($"u2".as("src"), $"u1".as("dst")))
      graft.operators.PageRank.run(s, edges)
        .select($"id".as("user_id"), round($"rank", 6).as("rank"))
        .orderBy($"rank".desc, $"user_id")
        .limit(10)
    }),

    // WEIGHTED PageRank: influence flows ∝ co-travel intensity (rank
    // splits across a user's ties by shared-hours weight, not uniformly)
    // — the strong-tie centrality twin of m_graph_pagerank, and the
    // natural companion to m_graph_sssp's 1/hours distances. A user
    // bridging many weak ties ranks lower here than in the unweighted
    // key; a member of a tight convoy ranks higher. Same loop, same
    // cadence discipline (the `weighted` flag only changes the out-mass
    // denominator to Σw and the contribution to c·w); PageRankSpec pins
    // the weighted reference AND that w ≡ 1 reproduces the unweighted
    // ranking exactly. No SQL oracle (iterative damped ranking).
    "m_graph_wpagerank" -> ((s, dir) => {
      import s.implicits._
      val pairs = coTravelerPairs(s, dir, cellDeg = 20.0, minHours = 2)
      val edges = pairs
        .select($"u1".as("src"), $"u2".as("dst"), $"n_hours".cast("double").as("w"))
        .unionAll(pairs
          .select($"u2".as("src"), $"u1".as("dst"), $"n_hours".cast("double").as("w")))
      graft.operators.PageRank.run(s, edges, weighted = true)
        .select($"id".as("user_id"), round($"rank", 6).as("rank"))
        .orderBy($"rank".desc, $"user_id")
        .limit(10)
    }),

    // Personalized PageRank from the 3 smallest vertex ids (random walk
    // with restart, Jeh & Widom WWW'03) — "who is close to THESE users",
    // the recommendation twin of the global ranking above. Same rounding/
    // tie discipline; unreachable vertices hold exactly zero mass and are
    // filtered so the top-10 is meaningful on sparse graphs. No SQL oracle
    // (iterative damped ranking); PprSpec pins node-wise equality to a
    // driver-side reference, Σrank = 1, zero-mass unreachability, and
    // seed-locality vs global PageRank.
    "m_graph_ppr" -> ((s, dir) => {
      import s.implicits._
      val pairs = coTravelerPairs(s, dir, cellDeg = 20.0, minHours = 2)
      val edges = pairs.select($"u1".as("src"), $"u2".as("dst"))
        .unionAll(pairs.select($"u2".as("src"), $"u1".as("dst")))
      val seeds = pairs.select($"u1".as("id")).unionAll(pairs.select($"u2".as("id")))
        .distinct().orderBy($"id").limit(3)
      graft.operators.Ppr.run(s, edges, seeds, iterations = 10)
        .filter($"rank" > 0.0)
        .select($"id".as("user_id"), round($"rank", 6).as("rank"))
        .orderBy($"rank".desc, $"user_id")
        .limit(10)
    }),

    // Degree distribution of the co-traveler graph (minHours ≥ 2): how
    // many users have k co-travel partners — the mixing-structure summary
    // an analyst reads before trusting m_graph_pagerank's ranking, and an
    // ORACLE-BACKED window into the same Convoy bucket-join the rank key
    // rides. Degrees take one user-keyed hash agg over the pair list; the
    // histogram agg is |distinct degrees| rows.
    "q_graph_degree" -> ((s, dir) => {
      import s.implicits._
      val pairs = coTravelerPairs(s, dir, cellDeg = 20.0, minHours = 2)
      pairs.select($"u1".as("user_id")).unionAll(pairs.select($"u2".as("user_id")))
        .groupBy($"user_id").agg(count(lit(1)).as("degree"))
        .groupBy($"degree").agg(count(lit(1)).as("n_users"))
        .orderBy($"degree")
    }),

    // Triangle count + wedge count of the co-traveler graph — the global
    // clustering-coefficient numerator/denominator (3T/W), emitted as the
    // two exact integers so no FP division enters the oracle compare. The
    // u1 < u2 edge orientation counts each triangle exactly once via the
    // standard two-hop path (a<b<c) + closing-edge equi-join — never an
    // all-pairs wedge materialization against unordered edges; wedges are
    // the integer-exact sum of C(degree, 2). Shares the memoized pair set
    // with m_graph_pagerank/q_graph_degree. At 100 TB the closing join is
    // edge-keyed (two-long key) and benefits from degree-orientation: the
    // a<b<c ordering already bounds fanout by the ordered out-degree.
    "q_graph_triangles" -> ((s, dir) => {
      import s.implicits._
      val (tri, deg) = triangleFrames(s, dir)
      val wedges = deg.agg(sum(expr("d * (d - 1) div 2")).as("n_wedges"))
      tri.agg(count(lit(1)).as("n_triangles")).crossJoin(wedges)
    }),

    // Local clustering coefficient distribution — how clique-like each
    // user's neighborhood is (the transitivity profile an analyst reads
    // beside the degree histogram): per node, triangles/wedges, bucketed
    // at 0.1. Same two-join triangle plan as q_graph_triangles (shared
    // memoized pair set; triples explode to their three corners for the
    // per-node count). Parity is structural: t and d(d−1)/2 are integers,
    // the coefficient one exact division, the avg decimal-routed. At
    // 100 TB the a<b<c orientation already sends each triangle through
    // the join once, and the per-node rollup is a key-sized hash agg.
    "q_graph_clustcoef" -> ((s, dir) => {
      import s.implicits._
      val (tri, deg) = triangleFrames(s, dir)
      val triNodes = tri
        .select(explode(array($"a", $"b", $"c")).as("u"))
        .groupBy($"u").agg(count(lit(1)).as("t"))
      deg.filter($"d" >= 2)
        .join(triNodes, Seq("u"), "left")
        .withColumn("t", coalesce($"t", lit(0L)))
        .withColumn("coef", $"t".cast("double") /
          expr("d * (d - 1) div 2").cast("double"))
        .withColumn("bucket", floor($"coef" * 10).cast("int"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_nodes"), r4(davg($"coef", 6)).as("avg_coef"))
        .orderBy($"bucket")
    }),

    // Community structure of the co-traveler graph via synchronous label
    // propagation — property-tested (LabelPropSpec: node-wise ≡ in-memory
    // reference, planted two-clique separation). Output is the community
    // SIZE histogram (size, n_communities) — the shape an analyst reads —
    // so the data-dependent label ids never enter the contract. Shares the
    // memoized pair set with PageRank/degree/triangles.
    "m_graph_lp" -> ((s, dir) => {
      import s.implicits._
      val pairs = coTravelerPairs(s, dir, cellDeg = 20.0, minHours = 2)
      val edges = pairs.select($"u1".as("src"), $"u2".as("dst"))
        .unionAll(pairs.select($"u2".as("src"), $"u1".as("dst")))
      graft.operators.LabelProp.run(s, edges)
        .groupBy($"label").agg(count(lit(1)).as("size"))
        .groupBy($"size").agg(count(lit(1)).as("n_communities"))
        .orderBy($"size")
    }),

    // Multi-source BFS hop distances from the 3 smallest vertex ids of the
    // co-traveler graph — the reachability/radius primitive (how far does
    // influence spread from a seed set) beside PageRank/LP/triangles/CC.
    // Output is the (dist, n_users) layer histogram within 8 hops; seeds
    // are content-determined (smallest ids), so both engines pick the same
    // set with no driver-side choice. Oracle: recursive CTE over the same
    // pair edges, MIN(d) per vertex — hop distance by construction.
    "q_graph_bfs" -> ((s, dir) => {
      import s.implicits._
      val pairs = coTravelerPairs(s, dir, cellDeg = 20.0, minHours = 2)
      val verts = pairs.select($"u1".as("id")).unionAll(pairs.select($"u2".as("id")))
        .distinct()
      val seeds = verts.orderBy($"id").limit(3)
      graft.operators.Bfs.run(s, pairs.select($"u1", $"u2"), seeds, maxHops = 8)
        .groupBy($"dist").agg(count(lit(1)).as("n_users"))
        .orderBy($"dist")
    }),

    // Weighted single-source shortest paths over the co-traveler graph —
    // the distance-weighted twin of q_graph_bfs (hop counts treat a
    // 100-shared-hour tie and a 2-hour tie alike; SSSP does not). Edge
    // weight = 1/n_hours, so strongly co-traveling users are CLOSE and
    // the shortest path is the most-plausible association chain — the
    // "how tightly is this user linked to the hub" query of a telemetry
    // miner. Source = smallest vertex id (content-determined, no driver
    // choice); output is the reachable-distance histogram at 1e-2
    // resolution. Distances are BIT-deterministic (each path's length
    // accumulates left-to-right in relaxation order and min over paths is
    // order-independent — no shuffle-order sum anywhere), so the
    // bucketing is presentation, not a noise belt. No SQL oracle
    // (iterative relaxation); SsspSpec pins node-wise equality to a
    // driver-side Dijkstra on random weighted graphs plus the
    // non-convergence throw. Shares the memoized pair set; rounds emit
    // through LastIterations.
    "m_graph_sssp" -> ((s, dir) => {
      import s.implicits._
      val pairs = coTravelerPairs(s, dir, cellDeg = 20.0, minHours = 2)
      val edges = pairs
        .select($"u1".as("src"), $"u2".as("dst"), (lit(1.0) / $"n_hours").as("w"))
        .unionAll(pairs
          .select($"u2".as("src"), $"u1".as("dst"), (lit(1.0) / $"n_hours").as("w")))
      val source = edges.agg(min(least($"src", $"dst"))).as[Long].head()
      graft.operators.Sssp.run(s, edges, source)
        .groupBy(round($"d", 2).as("dist_bucket"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"dist_bucket")
    }),

    // Connected components of the co-traveler graph, declared directly:
    // component-size histogram (size, n_components). CC was previously
    // keyed only through its dedup-clustering consumer (q_dedup_cluster);
    // this key puts the operator itself through the oracle gate on a graph
    // with different density. Same alternating-star contraction + bounded
    // local endgame; oracle = recursive min-label reachability fixpoint.
    "q_graph_cc" -> ((s, dir) => {
      import s.implicits._
      val pairs = coTravelerPairs(s, dir, cellDeg = 20.0, minHours = 2)
      val verts = pairs.select($"u1".as("id")).unionAll(pairs.select($"u2".as("id")))
        .distinct()
      graft.operators.ConnectedComponents
        .run(s, verts, pairs.select($"u1".as("src"), $"u2".as("dst")))
        .groupBy($"comp").agg(count(lit(1)).as("size"))
        .groupBy($"size").agg(count(lit(1)).as("n_components"))
        .orderBy($"size")
    }),

    // Link prediction on the co-traveler graph (Liben-Nowell & Kleinberg,
    // CIKM 2003): for NON-adjacent pairs with ≥1 common neighbor, the
    // common-neighbor count and Adamic-Adar score Σ 1/ln(deg(z)) — "who
    // will co-travel next". Two-hop equi-join through the shared neighbor
    // (the inverted-index shape again: shuffles on vertex keys, fanout
    // bounded by Σ C(deg,2), never all pairs), minus existing edges via
    // anti-join. deg(z) ≥ 2 by construction (z touches both endpoints), so
    // ln is never 0. ln-parity discipline: per-z term rounded 6, summed
    // through DECIMAL; order by (cn desc, u, v) is aa-independent and
    // fully deterministic. Top-20 plans as TakeOrderedAndProject.
    "q_graph_linkpred" -> ((s, dir) => {
      import s.implicits._
      val pr = coTravelerPairs(s, dir, cellDeg = 20.0, minHours = 2)
        .select($"u1", $"u2")
      val sym = pr.select($"u1".as("u"), $"u2".as("v"))
        .unionAll(pr.select($"u2".as("u"), $"u1".as("v")))
      val deg = sym.groupBy($"u".as("z")).agg(count(lit(1)).as("deg"))
      val hops = sym.as("a").join(sym.as("b"), col("a.v") === col("b.u"))
        .select(col("a.u").as("u"), col("b.v").as("v"), col("a.v").as("z"))
        .filter($"u" < $"v")
      val nonEdges = hops.join(pr,
          hops("u") === pr("u1") && hops("v") === pr("u2"), "left_anti")
      nonEdges.join(deg, Seq("z"))
        .withColumn("term", round(lit(1.0) / log($"deg"), 6))
        .groupBy($"u", $"v")
        .agg(count(lit(1)).as("cn"),
             sum($"term".cast(org.apache.spark.sql.types.DecimalType(18, 6)))
               .cast("double").as("aa"))
        .filter($"cn" >= 1)
        .orderBy($"cn".desc, $"u", $"v")
        .limit(20)
    }),

    // k-core sizes of the co-traveler graph (Seidman 1983): vertices
    // surviving iterative degree-< k peeling, for k = 2 and 3 — the
    // dense-region summary a degree filter gets wrong (a hub whose
    // neighbors are all leaves has high degree but no 2-core membership).
    // No SQL oracle (iterative peeling has no recursive-CTE analog —
    // the fixpoint is over aggregates, not reachability); KCoreSpec pins
    // reference peeling, core nesting, internal-degree ≥ k, and the
    // hub-vs-core distinction.
    "m_graph_kcore" -> ((s, dir) => {
      import s.implicits._
      val pairs = coTravelerPairs(s, dir, cellDeg = 20.0, minHours = 2)
        .select($"u1", $"u2")
      Seq(2, 3).map { k =>
        graft.operators.KCore.coreMembers(s, pairs, k)
          .agg(count(lit(1)).as("n_vertices"))
          .select(lit(k).as("k"), $"n_vertices")
      }.reduce(_ unionAll _)
        .orderBy($"k")
    }),

    // Property-tested (DbscanSpec): exact match vs in-memory DBSCAN.
    // (ε=1.0°, minPts=5) picked off the measured degree distribution of the
    // derived lattice at bench density: mean ε-degree ≈ 4.9 → ~63% of
    // positions core with real border/noise fractions. ε=3.0 (mean degree
    // ~44) made every point core in one giant component — nothing
    // clustered and the CC stage ground for minutes.
    "m_dbscan" -> ((s, dir) => {
      import s.implicits._
      val p = withGeo(t(s, dir, "events"))
        .select($"event_id".as("id"), $"lat".as("y"), $"lon".as("x"))
      graft.operators.DBSCAN.run(s, p, eps = 1.0, minPts = 5)
        .groupBy($"role").agg(count(lit(1)).as("n"))
        .orderBy($"role")
    }),

    // Property-tested (KmeansSpec): purity vs generator labels, seed-stable.
    "m_kmeans" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val emb = t(s, dir, "embeddings")
        .withColumn("features", array_to_vector($"embedding"))
      val model = new KMeans().setK(10).setSeed(42L).setMaxIter(20).setInitMode("random").fit(emb)
      model.transform(emb)
        .groupBy($"prediction")
        .agg(count(lit(1)).as("n"))
        .select($"prediction".cast("long").as("cluster"), $"n")
        .orderBy($"n".desc, $"cluster")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_geo_haversine" -> (segCte +
      """
        |SELECT user_id,
        |  round(CAST(SUM(CAST(seg_km AS DECIMAL(18,4))) AS DOUBLE), 1) AS track_km,
        |  COUNT(seg_km) AS n_segs
        |FROM seg GROUP BY user_id ORDER BY user_id""".stripMargin),

    "q_geo_bbox" -> (ptsCte +
      """
        |SELECT event_type, COUNT(*) AS n_inside
        |FROM pts
        |WHERE lat BETWEEN -30.0 AND 30.0 AND lon BETWEEN -90.0 AND 90.0
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    "q_geo_polygon" -> (ptsCte +
      f"""
         |SELECT event_type, COUNT(*) AS n_bbox,
         |  CAST(SUM(CASE WHEN $polygonSqlPred%s
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
         |  round(CAST(SUM(CASE WHEN $polygonSqlPred%s
         |      THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
         |    AS inside_frac
         |FROM pts
         |WHERE lon BETWEEN $polyLonMin%.1f AND $polyLonMax%.1f
         |  AND lat BETWEEN $polyLatMin%.1f AND $polyLatMax%.1f
         |GROUP BY event_type ORDER BY event_type""".stripMargin),

    "q_geo_radius" -> (ptsCte +
      s"""
         |SELECT user_id, COUNT(*) AS n_close
         |FROM pts
         |WHERE ${HaversineDist.oracleSql("lat", "lon", "48.85", "2.35")} < 500.0
         |GROUP BY user_id ORDER BY user_id""".stripMargin),

    "q_geo_grid" -> (ptsCte +
      """
        |SELECT CAST(floor(lat / 10.0) AS BIGINT) AS cell_lat,
        |       CAST(floor(lon / 10.0) AS BIGINT) AS cell_lon,
        |       COUNT(*) AS n
        |FROM pts GROUP BY 1, 2
        |ORDER BY n DESC, cell_lat, cell_lon LIMIT 20""".stripMargin),

    "q_geo_knn" -> (ptsCte +
      s"""
         |SELECT event_id,
         |  round(${HaversineDist.oracleSql("lat", "lon", "10.0", "20.0")}, 3) AS dist_km
         |FROM pts ORDER BY dist_km, event_id LIMIT 5""".stripMargin),

    // Deliberately the FULL-SCAN brute force: hash equality proves the
    // grid-pruned plan loses no neighbour.
    "q_geo_knn_grid" -> (ptsCte +
      s"""
         |SELECT event_id,
         |  round(${HaversineDist.oracleSql("lat", "lon", "10.0", "20.0")}, 3) AS dist_km
         |FROM pts ORDER BY dist_km, event_id LIMIT 5""".stripMargin),

    // Deliberately the FULL exact distance join (no grid): hash equality
    // proves the 3×3 cell-bucket candidate generation loses no pair.
    "q_geo_join" -> (ptsCte +
      s""",
         |evf AS (SELECT event_id, user_id, lat, lon FROM pts
         |        WHERE lat BETWEEN -60.0 AND 60.0),
         |dep AS (
         |  SELECT o_orderkey AS depot_id,
         |    ((o_orderkey * 59) % 1700) / 10.0 - 85.0 AS d_lat,
         |    ((o_orderkey * 211) % 3600) / 10.0 - 180.0 AS d_lon
         |  FROM orders WHERE o_orderkey % 101 = 7),
         |depf AS (SELECT * FROM dep WHERE d_lat BETWEEN -60.0 AND 60.0),
         |pairs AS (
         |  SELECT depot_id, user_id,
         |    ${HaversineDist.oracleSql("d_lat", "d_lon", "lat", "lon")} AS km
         |  FROM depf CROSS JOIN evf
         |  WHERE ${HaversineDist.oracleSql("d_lat", "d_lon", "lat", "lon")} < 200.0)
         |SELECT depot_id, COUNT(*) AS n_events,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  round(MIN(km), 3) AS min_km
         |FROM pairs GROUP BY depot_id ORDER BY depot_id""".stripMargin),

    "q_geo_od" -> (ptsCte +
      """,
        |e AS (
        |  SELECT user_id, ts_us // 86400000000 AS day, event_id, ts_us,
        |    CAST(CAST(floor(lat / 10.0) AS BIGINT) AS VARCHAR) || ':' ||
        |    CAST(CAST(floor(lon / 10.0) AS BIGINT) AS VARCHAR) AS cell
        |  FROM pts),
        |od AS (
        |  SELECT first_value(cell) OVER w AS origin,
        |         last_value(cell) OVER w AS dest,
        |         row_number() OVER (PARTITION BY user_id, day
        |                            ORDER BY ts_us, event_id) AS rn
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id, day ORDER BY ts_us, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT origin, dest, COUNT(*) AS n_trips
        |FROM od WHERE rn = 1
        |GROUP BY origin, dest ORDER BY origin, dest""".stripMargin),

    "q_traj_speed" -> (segCte +
      """
        |SELECT user_id, COUNT(*) AS n_segs,
        |  round(CAST(SUM(CAST(seg_km AS DECIMAL(18,4))) AS DOUBLE), 1) AS total_km,
        |  round(CAST(SUM(CAST(seg_km AS DECIMAL(18,4))) AS DOUBLE)
        |        / (SUM(dt_us) / 3.6e9), 2) AS avg_speed_kmh,
        |  CAST(round(MAX(seg_km / (dt_us / 3.6e9)), 0) AS BIGINT) AS max_speed_kmh,
        |  COUNT(*) FILTER (WHERE seg_km / (dt_us / 3.6e9) > 1000.0) AS n_speeding
        |FROM seg WHERE dt_us > 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin),

    "q_traj_stay" -> (segCte +
      """,
        |runs AS (
        |  SELECT user_id, rid, COUNT(*) AS n_pts,
        |    MAX(ts_us) - MIN(ts_us) AS span_us
        |  FROM (
        |    SELECT user_id, ts_us,
        |      SUM(CASE WHEN seg_km IS NULL OR seg_km > 3000.0 THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
        |    FROM seg) t
        |  GROUP BY user_id, rid)
        |SELECT user_id, COUNT(*) AS n_runs,
        |  COUNT(*) FILTER (WHERE n_pts >= 3 AND span_us >= 600000000) AS n_stays
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin),

    "q_traj_convoy" -> (ptsCte +
      """,
        |p AS (
        |  SELECT DISTINCT user_id, ts_us // 3600000000 AS hb,
        |    CAST(FLOOR(lat / 20) AS BIGINT) AS cla, CAST(FLOOR(lon / 20) AS BIGINT) AS clo
        |  FROM pts)
        |SELECT a.user_id AS u1, b.user_id AS u2, COUNT(DISTINCT a.hb) AS n_hours
        |FROM p a JOIN p b
        |  ON a.hb = b.hb AND a.cla = b.cla AND a.clo = b.clo
        |  AND a.user_id < b.user_id
        |GROUP BY u1, u2 HAVING COUNT(DISTINCT a.hb) >= 3
        |ORDER BY u1, u2""".stripMargin),

    "q_graph_triangles" -> (ptsCte +
      """,
        |p AS (
        |  SELECT DISTINCT user_id, ts_us // 3600000000 AS hb,
        |    CAST(FLOOR(lat / 20) AS BIGINT) AS cla, CAST(FLOOR(lon / 20) AS BIGINT) AS clo
        |  FROM pts),
        |pr AS (
        |  SELECT a.user_id AS u1, b.user_id AS u2
        |  FROM p a JOIN p b
        |    ON a.hb = b.hb AND a.cla = b.cla AND a.clo = b.clo
        |    AND a.user_id < b.user_id
        |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.hb) >= 2),
        |tri AS (
        |  SELECT COUNT(*) AS n_triangles
        |  FROM pr ab JOIN pr bc ON ab.u2 = bc.u1
        |  JOIN pr ac ON ac.u1 = ab.u1 AND ac.u2 = bc.u2),
        |deg AS (
        |  SELECT user_id, COUNT(*) AS d FROM (
        |    SELECT u1 AS user_id FROM pr UNION ALL SELECT u2 AS user_id FROM pr) x
        |  GROUP BY user_id),
        |w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
        |SELECT n_triangles, n_wedges FROM tri, w""".stripMargin),

    "q_graph_clustcoef" -> (ptsCte +
      """,
        |p AS (
        |  SELECT DISTINCT user_id, ts_us // 3600000000 AS hb,
        |    CAST(FLOOR(lat / 20) AS BIGINT) AS cla, CAST(FLOOR(lon / 20) AS BIGINT) AS clo
        |  FROM pts),
        |pr AS (
        |  SELECT a.user_id AS u1, b.user_id AS u2
        |  FROM p a JOIN p b
        |    ON a.hb = b.hb AND a.cla = b.cla AND a.clo = b.clo
        |    AND a.user_id < b.user_id
        |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.hb) >= 2),
        |tn AS (
        |  SELECT u, COUNT(*) AS t FROM (
        |    SELECT ab.u1 AS u FROM pr ab JOIN pr bc ON ab.u2 = bc.u1
        |      JOIN pr ac ON ac.u1 = ab.u1 AND ac.u2 = bc.u2
        |    UNION ALL
        |    SELECT ab.u2 FROM pr ab JOIN pr bc ON ab.u2 = bc.u1
        |      JOIN pr ac ON ac.u1 = ab.u1 AND ac.u2 = bc.u2
        |    UNION ALL
        |    SELECT bc.u2 FROM pr ab JOIN pr bc ON ab.u2 = bc.u1
        |      JOIN pr ac ON ac.u1 = ab.u1 AND ac.u2 = bc.u2) x
        |  GROUP BY u),
        |deg AS (
        |  SELECT user_id AS u, COUNT(*) AS d FROM (
        |    SELECT u1 AS user_id FROM pr UNION ALL SELECT u2 AS user_id FROM pr) x
        |  GROUP BY user_id),
        |co AS (
        |  SELECT deg.u, CAST(COALESCE(tn.t, 0) AS DOUBLE) /
        |    CAST(deg.d * (deg.d - 1) // 2 AS DOUBLE) AS coef
        |  FROM deg LEFT JOIN tn ON deg.u = tn.u
        |  WHERE deg.d >= 2)
        |SELECT CAST(FLOOR(coef * 10) AS INT) AS bucket, COUNT(*) AS n_nodes,
        |  round(CAST(SUM(CAST(coef AS DECIMAL(18,6))) AS DOUBLE) / COUNT(coef), 4)
        |    AS avg_coef
        |FROM co GROUP BY bucket ORDER BY bucket""".stripMargin),

    "q_graph_degree" -> (ptsCte +
      """,
        |p AS (
        |  SELECT DISTINCT user_id, ts_us // 3600000000 AS hb,
        |    CAST(FLOOR(lat / 20) AS BIGINT) AS cla, CAST(FLOOR(lon / 20) AS BIGINT) AS clo
        |  FROM pts),
        |pr AS (
        |  SELECT a.user_id AS u1, b.user_id AS u2
        |  FROM p a JOIN p b
        |    ON a.hb = b.hb AND a.cla = b.cla AND a.clo = b.clo
        |    AND a.user_id < b.user_id
        |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.hb) >= 2),
        |deg AS (
        |  SELECT user_id, COUNT(*) AS degree FROM (
        |    SELECT u1 AS user_id FROM pr UNION ALL SELECT u2 AS user_id FROM pr) x
        |  GROUP BY user_id)
        |SELECT degree, COUNT(*) AS n_users
        |FROM deg GROUP BY degree ORDER BY degree""".stripMargin),

    "q_graph_bfs" -> (ptsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,
        |p AS (
        |  SELECT DISTINCT user_id, ts_us // 3600000000 AS hb,
        |    CAST(FLOOR(lat / 20) AS BIGINT) AS cla, CAST(FLOOR(lon / 20) AS BIGINT) AS clo
        |  FROM pts),
        |pr AS (
        |  SELECT a.user_id AS u1, b.user_id AS u2
        |  FROM p a JOIN p b
        |    ON a.hb = b.hb AND a.cla = b.cla AND a.clo = b.clo
        |    AND a.user_id < b.user_id
        |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.hb) >= 2),
        |verts AS (
        |  SELECT DISTINCT u AS id FROM (
        |    SELECT u1 AS u FROM pr UNION ALL SELECT u2 FROM pr) x),
        |seeds AS (SELECT id FROM verts ORDER BY id LIMIT 3),
        |sym AS (SELECT u1 AS src, u2 AS dst FROM pr
        |        UNION ALL SELECT u2, u1 FROM pr),
        |walk(id, d) AS (
        |  SELECT id, 0 FROM seeds
        |  UNION
        |  SELECT s.dst, w.d + 1 FROM walk w JOIN sym s ON s.src = w.id
        |  WHERE w.d < 8),
        |dist AS (SELECT id, MIN(d) AS dist FROM walk GROUP BY id)
        |SELECT dist, COUNT(*) AS n_users
        |FROM dist GROUP BY dist ORDER BY dist""".stripMargin),

    "q_graph_cc" -> (ptsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,
        |p AS (
        |  SELECT DISTINCT user_id, ts_us // 3600000000 AS hb,
        |    CAST(FLOOR(lat / 20) AS BIGINT) AS cla, CAST(FLOOR(lon / 20) AS BIGINT) AS clo
        |  FROM pts),
        |pr AS (
        |  SELECT a.user_id AS u1, b.user_id AS u2
        |  FROM p a JOIN p b
        |    ON a.hb = b.hb AND a.cla = b.cla AND a.clo = b.clo
        |    AND a.user_id < b.user_id
        |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.hb) >= 2),
        |sym AS (SELECT u1 AS u, u2 AS v FROM pr
        |        UNION ALL SELECT u2, u1 FROM pr),
        |walk(u, v) AS (
        |  SELECT u, v FROM sym
        |  UNION
        |  SELECT w.u, s.v FROM walk w JOIN sym s ON w.v = s.u),
        |assign AS (
        |  SELECT u AS id, CAST(least(u, MIN(v)) AS BIGINT) AS comp
        |  FROM walk GROUP BY u),
        |sizes AS (SELECT comp, COUNT(*) AS size FROM assign GROUP BY comp)
        |SELECT size, COUNT(*) AS n_components
        |FROM sizes GROUP BY size ORDER BY size""".stripMargin),

    "q_graph_linkpred" -> (ptsCte +
      """,
        |p AS (
        |  SELECT DISTINCT user_id, ts_us // 3600000000 AS hb,
        |    CAST(FLOOR(lat / 20) AS BIGINT) AS cla, CAST(FLOOR(lon / 20) AS BIGINT) AS clo
        |  FROM pts),
        |pr AS (
        |  SELECT a.user_id AS u1, b.user_id AS u2
        |  FROM p a JOIN p b
        |    ON a.hb = b.hb AND a.cla = b.cla AND a.clo = b.clo
        |    AND a.user_id < b.user_id
        |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.hb) >= 2),
        |sym AS (SELECT u1 AS u, u2 AS v FROM pr
        |        UNION ALL SELECT u2, u1 FROM pr),
        |deg AS (SELECT u AS z, COUNT(*) AS deg FROM sym GROUP BY u),
        |hops AS (
        |  SELECT a.u AS u, b.v AS v, a.v AS z
        |  FROM sym a JOIN sym b ON a.v = b.u
        |  WHERE a.u < b.v),
        |ne AS (
        |  SELECT h.* FROM hops h
        |  WHERE NOT EXISTS (SELECT 1 FROM pr WHERE u1 = h.u AND u2 = h.v)),
        |scored AS (
        |  SELECT u, v, COUNT(*) AS cn,
        |    CAST(SUM(CAST(round(1.0 / ln(deg), 6) AS DECIMAL(18,6))) AS DOUBLE) AS aa
        |  FROM ne JOIN deg USING (z)
        |  GROUP BY u, v HAVING COUNT(*) >= 1)
        |SELECT u, v, cn, aa FROM scored
        |ORDER BY cn DESC, u, v LIMIT 20""".stripMargin),

    "q_traj_sim" -> (ptsCte +
      """,
        |cells AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(lat / 10.0) AS BIGINT) AS cx,
        |    CAST(floor(lon / 10.0) AS BIGINT) AS cy
        |  FROM pts),
        |sizes AS (SELECT user_id, COUNT(*) AS n_cells FROM cells GROUP BY user_id),
        |inter AS (
        |  SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS n_inter
        |  FROM cells a JOIN cells b ON a.cx = b.cx AND a.cy = b.cy
        |  WHERE a.user_id < b.user_id
        |  GROUP BY a.user_id, b.user_id)
        |SELECT u1, u2,
        |  round(n_inter * 1.0 / (s1.n_cells + s2.n_cells - n_inter), 4) AS jaccard
        |FROM inter
        |JOIN sizes s1 ON s1.user_id = u1
        |JOIN sizes s2 ON s2.user_id = u2
        |ORDER BY jaccard DESC, u1, u2 LIMIT 10""".stripMargin)
  )
}
