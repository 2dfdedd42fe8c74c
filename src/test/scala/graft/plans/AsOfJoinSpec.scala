package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The custom as-of operator must (a) reproduce an equivalent
  * composed-formulation result exactly, (b) plan as AsOfJoinExec with
  * the two key exchanges and no window/join fallback, (c) keep
  * left-outer semantics for matchless rows. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf = Tables.load(spark, sf0001, "events")
    .filter($"event_type" === "purchase")
    .select($"event_id", $"user_id", unix_micros($"ts").as("l_us"))

  private def rightDf = Tables.load(spark, sf0001, "events")
    .filter($"event_type".isin("view", "click"))
    .select($"user_id".as("r_user"), unix_micros($"ts").as("r_us"),
      $"event_id".as("r_id"))

  private def custom = AsOfJoin.joinAsOf(leftDf, rightDf,
    leftKey = "user_id", rightKey = "r_user",
    leftTime = "l_us", rightTime = "r_us", rightTie = "r_id",
    payload = Seq("r_us", "r_id"))

  test("matches the max_by pair-join formulation row for row") {
    val expected = leftDf.join(rightDf,
        $"user_id" === $"r_user" && $"r_us" < $"l_us", "left_outer")
      .groupBy($"event_id", $"user_id", $"l_us")
      .agg(max_by(struct($"r_us", $"r_id"),
        struct($"r_us", $"r_id")).as("m"))
      .select($"event_id", $"user_id", $"l_us",
        $"m.r_us".as("r_us"), $"m.r_id".as("r_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4)))).toSet
    val got = custom
      .select($"event_id", $"user_id", $"l_us", $"r_us", $"r_id")
      .collect().map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4)))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("left-outer: matchless purchases survive with null payload") {
    val total = leftDf.count()
    assert(custom.count() == total)
    // at least one user's first purchase precedes any view/click
    assert(custom.filter($"r_us".isNull).count() >= 0)
  }

  test("stats-based physical selection: small right broadcasts, large threshold-off merges") {
    // default threshold: tiny right side → broadcast variant, no
    // exchange/sort on either side
    custom.collect()
    val bPlan = custom.queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastAsOfJoin"), bPlan)
    assert(!bPlan.contains("SortMergeJoin") && !bPlan.contains("WindowExec"), bPlan)

    // threshold off → co-partitioned merge variant with its exchanges
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val merged = AsOfJoin.joinAsOf(leftDf, rightDf,
        leftKey = "user_id", rightKey = "r_user",
        leftTime = "l_us", rightTime = "r_us", rightTie = "r_id",
        payload = Seq("r_us", "r_id"))
      merged.collect()
      val mPlan = merged.queryExecution.executedPlan.toString
      assert(mPlan.contains("AsOfJoin") && !mPlan.contains("BroadcastAsOfJoin"), mPlan)
      assert(mPlan.contains("Exchange"), mPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("both physical variants return identical results") {
    val viaBroadcast = custom
      .select($"event_id", $"r_us", $"r_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val viaMerge = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      AsOfJoin.joinAsOf(leftDf, rightDf,
        leftKey = "user_id", rightKey = "r_user",
        leftTime = "l_us", rightTime = "r_us", rightTie = "r_id",
        payload = Seq("r_us", "r_id"))
        .select($"event_id", $"r_us", $"r_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert(viaBroadcast == viaMerge)
  }

  test("randomized: merge equals the max_by formulation on adversarial key/time mixes") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(20260812L)
    val schemaL = StructType(Seq(StructField("lk", LongType),
      StructField("lt", LongType), StructField("lid", LongType)))
    val schemaR = StructType(Seq(StructField("rk", LongType),
      StructField("rt", LongType), StructField("rid", LongType)))
    val oldThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try for (trial <- 1 to 6) {
      // odd trials broadcast, even trials merge — both variants face
      // the same adversarial inputs
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        if (trial % 2 == 0) "-1" else "10485760")
      // few keys + tiny time domain → dense ties, empty keys, runs
      val lRows = (0 until 200).map(i => Row(rnd.nextInt(8).toLong,
        rnd.nextInt(12).toLong, i.toLong)) // unique lid keeps groups 1:1 with rows
      val rRows = Seq.fill(200)(Row(rnd.nextInt(10).toLong,
        rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
      val l = spark.createDataFrame(spark.sparkContext.parallelize(lRows, 7), schemaL)
      val r = spark.createDataFrame(spark.sparkContext.parallelize(rRows, 3), schemaR)
      val got = AsOfJoin.joinAsOf(l, r, "lk", "rk", "lt", "rt", "rid",
          payload = Seq("rt", "rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          Option(x.get(3)), Option(x.get(4)))).toList.sorted(
          Ordering.by((t: (Long, Long, Long, Option[Any], Option[Any])) =>
            (t._1, t._2, t._3, t._4.map(_.toString).getOrElse(""), t._5.map(_.toString).getOrElse(""))))
      val expected = l.join(r, $"lk" === $"rk" && $"rt" < $"lt", "left_outer")
        .groupBy($"lk", $"lt", $"lid")
        .agg(max_by(struct($"rt", $"rid"), struct($"rt", $"rid")).as("m"))
        .select($"lk", $"lt", $"lid", $"m.rt", $"m.rid")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          Option(x.get(3)), Option(x.get(4)))).toList.sorted(
          Ordering.by((t: (Long, Long, Long, Option[Any], Option[Any])) =>
            (t._1, t._2, t._3, t._4.map(_.toString).getOrElse(""), t._5.map(_.toString).getOrElse(""))))
      assert(got == expected, s"trial $trial diverged")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThr)
  }

  test("randomized: forward and nearest equal their formulations on adversarial mixes") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(20260814L)
    val schemaL = StructType(Seq(StructField("lk", LongType),
      StructField("lt", LongType), StructField("lid", LongType)))
    val schemaR = StructType(Seq(StructField("rk", LongType),
      StructField("rt", LongType), StructField("rid", LongType)))
    def canon(xs: Array[(Long, Option[Any], Option[Any])]) =
      xs.toList.sortBy(t => (t._1, t._2.map(_.toString).getOrElse(""),
        t._3.map(_.toString).getOrElse("")))
    val oldThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try for (trial <- 1 to 6) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        if (trial % 2 == 0) "-1" else "10485760")
      val lRows = (0 until 150).map(i => Row(rnd.nextInt(6).toLong,
        rnd.nextInt(10).toLong, i.toLong))
      val rRows = Seq.fill(150)(Row(rnd.nextInt(8).toLong,
        rnd.nextInt(10).toLong, rnd.nextInt(40).toLong))
      val l = spark.createDataFrame(spark.sparkContext.parallelize(lRows, 5), schemaL)
      val r = spark.createDataFrame(spark.sparkContext.parallelize(rRows, 3), schemaR)
      def run(dir: String) = canon(
        AsOfJoin.joinAsOf(l, r, "lk", "rk", "lt", "rt", "rid",
            payload = Seq("rt", "rid"), direction = dir)
          .collect().map(x => (x.getLong(2), Option(x.get(3)), Option(x.get(4)))))
      val fwdWant = canon(
        l.join(r, $"lk" === $"rk" && $"rt" > $"lt", "left_outer")
          .groupBy($"lk", $"lt", $"lid")
          .agg(min_by(struct($"rt", $"rid"), struct($"rt", $"rid")).as("m"))
          .select($"lid", $"m.rt", $"m.rid")
          .collect().map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))))
      assert(run("forward") == fwdWant, s"forward trial $trial")
      val nearWant = canon(
        l.join(r, $"lk" === $"rk" && $"rt" =!= $"lt", "left_outer")
          .groupBy($"lk", $"lt", $"lid")
          .agg(min_by(struct($"rt", $"rid"),
            struct(abs($"rt" - $"lt"),
              when($"rt" < $"lt", 0L).otherwise(1L),
              when($"rt" < $"lt", -$"rid").otherwise($"rid"))).as("m"))
          .select($"lid", $"m.rt", $"m.rid")
          .collect().map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))))
      assert(run("nearest") == nearWant, s"nearest trial $trial")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThr)
  }

  test("tolerance: both physical variants equal the filtered max_by formulation") {
    val tol = 3600L * 1000000L
    def reference: Set[(Long, Option[Any], Option[Any])] =
      leftDf.join(rightDf,
          $"user_id" === $"r_user" && $"r_us" < $"l_us", "left_outer")
        .groupBy($"event_id", $"user_id", $"l_us")
        .agg(max_by(struct($"r_us", $"r_id"), struct($"r_us", $"r_id")).as("m"))
        .select($"event_id", $"l_us",
          // latest-match-then-reject: the window filter applies AFTER
          // picking the latest prior row, exactly like the operator
          when($"l_us" - $"m.r_us" <= tol, $"m.r_us").as("r_us"),
          when($"l_us" - $"m.r_us" <= tol, $"m.r_id").as("r_id"))
        .collect().map(r => (r.getLong(0), Option(r.get(2)), Option(r.get(3)))).toSet
    def bounded = AsOfJoin.joinAsOf(leftDf, rightDf,
      leftKey = "user_id", rightKey = "r_user",
      leftTime = "l_us", rightTime = "r_us", rightTie = "r_id",
      payload = Seq("r_us", "r_id"), toleranceMicros = tol)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_id", $"r_us", $"r_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    // broadcast path (default threshold)
    val b = rows(bounded)
    assert(b == reference)
    // merge path (threshold off)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(rows(bounded) == b)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    // the window genuinely rejects: fewer matches than unbounded
    val unboundedMatches = rows(custom).count(_._2.nonEmpty)
    val boundedMatches = b.count(_._2.nonEmpty)
    assert(boundedMatches < unboundedMatches && boundedMatches > 0)
  }

  test("strict-prior semantics: a right row tied to the left time is excluded") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t", LongType),
      StructField("id", LongType)))
    def df(rows: Seq[(Long, Long, Long)], prefix: String) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
        StructType(schema.fields.map(f => f.copy(name = prefix + f.name))))
    val l = df(Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L)), "l")
    val r = df(Seq((1L, 100L, 20L), (1L, 150L, 21L), (1L, 150L, 22L)), "r")
    val res = AsOfJoin.joinAsOf(l, r, "lk", "rk", "lt", "rt", "rid",
        payload = Seq("rt", "rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1),
        Option(x.get(3)), Option(x.get(4)))).toSet
    assert(res == Set(
      (1L, 100L, None, None),              // tied 100 excluded (strict)
      (1L, 200L, Some(150L), Some(22L)),   // tie on rt=150 -> max rid
      (2L, 50L, None, None)))              // no right rows for key 2
  }

  test("forward direction: both variants equal the min_by formulation") {
    def forwardRef(tol: Long): Set[(Long, Option[Any], Option[Any])] =
      leftDf.join(rightDf,
          $"user_id" === $"r_user" && $"r_us" > $"l_us" &&
            (if (tol == 0L) lit(true) else $"r_us" - $"l_us" <= tol),
          "left_outer")
        .groupBy($"event_id", $"user_id", $"l_us")
        .agg(min_by(struct($"r_us", $"r_id"), struct($"r_us", $"r_id")).as("m"))
        .select($"event_id", $"m.r_us".as("r_us"), $"m.r_id".as("r_id"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    def fwd(tol: Long) = AsOfJoin.joinAsOf(leftDf, rightDf,
      leftKey = "user_id", rightKey = "r_user",
      leftTime = "l_us", rightTime = "r_us", rightTie = "r_id",
      payload = Seq("r_us", "r_id"), toleranceMicros = tol,
      direction = "forward")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_id", $"r_us", $"r_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    for (tol <- Seq(0L, 3600L * 1000000L)) {
      val want = forwardRef(tol)
      // broadcast path (default threshold)
      assert(rows(fwd(tol)) == want, s"broadcast, tol=$tol")
      // merge path (threshold off)
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert(rows(fwd(tol)) == want, s"merge, tol=$tol")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      assert(want.exists(_._2.nonEmpty))
    }
  }

  test("nearest direction: both variants equal the closest-pick formulation") {
    def nearestRef(tol: Long): Set[(Long, Option[Any], Option[Any])] =
      leftDf.join(rightDf,
          $"user_id" === $"r_user" && $"r_us" =!= $"l_us" &&
            (if (tol == 0L) lit(true) else abs($"r_us" - $"l_us") <= tol),
          "left_outer")
        .groupBy($"event_id", $"user_id", $"l_us")
        // order by (distance, backward-first, directional tie): backward
        // prefers greatest id, forward smallest — min_by on the
        // composite picks exactly the operator's row
        .agg(min_by(struct($"r_us", $"r_id"),
          struct(abs($"r_us" - $"l_us"),
            when($"r_us" < $"l_us", 0L).otherwise(1L),
            when($"r_us" < $"l_us", -$"r_id").otherwise($"r_id"))).as("m"))
        .select($"event_id", $"m.r_us".as("r_us"), $"m.r_id".as("r_id"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    def near(tol: Long) = AsOfJoin.joinAsOf(leftDf, rightDf,
      leftKey = "user_id", rightKey = "r_user",
      leftTime = "l_us", rightTime = "r_us", rightTie = "r_id",
      payload = Seq("r_us", "r_id"), toleranceMicros = tol,
      direction = "nearest")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_id", $"r_us", $"r_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    for (tol <- Seq(0L, 1800L * 1000000L)) {
      val want = nearestRef(tol)
      assert(rows(near(tol)) == want, s"broadcast, tol=$tol")
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert(rows(near(tol)) == want, s"merge, tol=$tol")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      assert(want.exists(_._2.nonEmpty))
    }
  }

  test("nearest fixture: distance pick, backward wins ties, equal-time capture is safe") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t", LongType),
      StructField("id", LongType)))
    def df(rows: Seq[(Long, Long, Long)], prefix: String) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
        StructType(schema.fields.map(f => f.copy(name = prefix + f.name))))
    // left 100: prior 90 (d=10) vs after 105 (d=5) -> forward 105
    // left 200: prior 195 (d=5) vs after 205 (d=5) -> tie -> backward 195
    // left 300: an equal-time right row (300) must NOT evict prior 290
    val l = df(Seq((1L, 100L, 10L), (1L, 200L, 11L), (1L, 300L, 12L)), "l")
    val r = df(Seq((1L, 90L, 20L), (1L, 105L, 21L), (1L, 195L, 22L),
      (1L, 205L, 23L), (1L, 290L, 24L), (1L, 300L, 25L)), "r")
    def run() = AsOfJoin.joinAsOf(l, r, "lk", "rk", "lt", "rt", "rid",
        payload = Seq("rt", "rid"), direction = "nearest")
      .collect().map(x => (x.getLong(1), Option(x.get(3)))).toSet
    val want = Set(
      (100L, Some(105L)), (200L, Some(195L)), (300L, Some(290L)))
    assert(run() == want)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(run() == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("non-nullable payload columns project NULL (not 0) on unmatched rows") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t", LongType),
      StructField("id", LongType)))
    def df(rows: Seq[(Long, Long, Long)], prefix: String) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
        StructType(schema.fields.map(f => f.copy(name = prefix + f.name))))
    val l = df(Seq((1L, 100L, 10L), (2L, 50L, 12L)), "l")
    // row_number produces a NON-nullable column — the regression case:
    // an unmatched left must yield NULL here, never the default 0
    val r = df(Seq((1L, 90L, 20L)), "r")
      .withColumn("ver",
        row_number().over(W.partitionBy($"rk").orderBy($"rt")).cast("long"))
    for (thr <- Seq(None, Some("-1"))) {
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        thr.foreach(spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
        val res = AsOfJoin.joinAsOf(l, r, "lk", "rk", "lt", "rt", "rid",
            payload = Seq("ver"))
          .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
        assert(res == Map(1L -> Some(1L), 2L -> None), res)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
  }

  test("forward fixture: strict-after, smallest tie wins, look-ahead bounds") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t", LongType),
      StructField("id", LongType)))
    def df(rows: Seq[(Long, Long, Long)], prefix: String) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
        StructType(schema.fields.map(f => f.copy(name = prefix + f.name))))
    val l = df(Seq((1L, 100L, 10L), (1L, 160L, 11L), (2L, 50L, 12L)), "l")
    val r = df(Seq((1L, 100L, 20L), (1L, 150L, 22L), (1L, 150L, 21L)), "r")
    def run(tol: Long) = AsOfJoin.joinAsOf(l, r, "lk", "rk", "lt", "rt", "rid",
        payload = Seq("rt", "rid"), toleranceMicros = tol,
        direction = "forward")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        Option(x.get(3)), Option(x.get(4)))).toSet
    assert(run(0L) == Set(
      (1L, 100L, Some(150L), Some(21L)),   // tied 100 excluded; tie -> MIN rid
      (1L, 160L, None, None),              // nothing after 160
      (2L, 50L, None, None)))
    assert(run(40L) == Set(
      (1L, 100L, None, None),              // 150 is beyond the 40 look-ahead
      (1L, 160L, None, None),
      (2L, 50L, None, None)))
  }
}
