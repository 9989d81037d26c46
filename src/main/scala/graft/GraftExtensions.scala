package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._
import graft.functions.Fnv1a64Expr

/** Spark-native extension point: registers graft's custom Catalyst
  * expressions AND a ClickHouse-compatibility function surface, so the
  * SQL a user of the reference engine runs against ClickHouse
  * (main.py:65's ReplacingMergeTree tables exist to serve exactly these
  * functions) works verbatim through `spark.sql`:
  *
  *   uniq, uniqExact, toStartOfHour/Day/Minute/Month, toDate,
  *   toDateTime, toInt32/Int64, toUInt32/UInt64 (wraparound semantics,
  *   main.py:89-91), toFloat64, fnv1a64.
  *
  * Install either with `spark.sql.extensions=graft.GraftExtensions` at
  * session build time, or post-hoc via [[GraftExtensions.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def d(name: String, clazz: Class[_] = classOf[Expression])
               (builder: Seq[Expression] => Expression): FunctionDescriptor =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  private def one(name: String)(f: Expression => Expression): FunctionDescriptor =
    d(name) { children =>
      require(children.length == 1, s"$name expects exactly one argument")
      f(children.head)
    }

  val descriptors: Seq[FunctionDescriptor] = Seq(
    one("fnv1a64")(Fnv1a64Expr(_)),
    // ClickHouse approximate distinct (`uniq`) -> HLL++
    one("uniq")(c => HyperLogLogPlusPlus(c).toAggregateExpression()),
    // exact distinct (`uniqExact`) -> COUNT(DISTINCT x)
    one("uniqExact")(c => Count(Seq(c)).toAggregateExpression(isDistinct = true)),
    one("toStartOfHour")(TruncTimestamp(Literal("hour"), _)),
    one("toStartOfDay")(TruncTimestamp(Literal("day"), _)),
    one("toStartOfMinute")(TruncTimestamp(Literal("minute"), _)),
    one("toStartOfMonth")(TruncTimestamp(Literal("month"), _)),
    one("toDate")(Cast(_, DateType)),
    one("toDateTime")(Cast(_, TimestampType)),
    one("toInt32")(Cast(_, IntegerType)),
    one("toInt64")(Cast(_, LongType)),
    one("toFloat64")(Cast(_, DoubleType)),
    // UInt32/UInt64 with the reference's wraparound masking semantics
    one("toUInt32")(c => BitwiseAnd(Cast(c, LongType), Literal(0xFFFFFFFFL))),
    one("toUInt64")(Cast(_, LongType)),
    // ClickHouse argMax/argMin(value, weight)
    two("argMax")((v, w) => MaxBy(v, w).toAggregateExpression()),
    two("argMin")((v, w) => MinBy(v, w).toAggregateExpression()),
    // -If combinators: aggregate only rows where cond holds (the NULL
    // branch is skipped by the underlying aggregate, exactly CH's skip)
    one("countIf")(c =>
      Count(Seq(If(c, Literal(1), Literal(null, IntegerType)))).toAggregateExpression()),
    two("sumIf")((x, c) =>
      Sum(If(c, x, Literal(null, x.dataType))).toAggregateExpression()),
    two("avgIf")((x, c) =>
      Average(If(c, x, Literal(null, x.dataType))).toAggregateExpression()),
    // ClickHouse JSONExtract* over JSON-string columns (e.g. the
    // events.props payload): key is a plain field name, as in CH
    // missing key -> '' (CH's default-value contract), not NULL
    two("JSONExtractString")((j, k) =>
      Coalesce(Seq(GetJsonObject(j, jsonPath(k)), Literal("")))),
    two("JSONExtractInt")((j, k) =>
      Cast(GetJsonObject(j, jsonPath(k)), LongType)),
    two("JSONExtractFloat")((j, k) =>
      Cast(GetJsonObject(j, jsonPath(k)), DoubleType)),
    two("JSONExtractBool")((j, k) =>
      Coalesce(Seq(Cast(GetJsonObject(j, jsonPath(k)), BooleanType),
        Literal(false)))),
    // raw JSON of the field (objects/arrays come back as JSON text)
    two("JSONExtractRaw")((j, k) =>
      Coalesce(Seq(GetJsonObject(j, jsonPath(k)), Literal("")))),
    two("JSONHas")((j, k) => IsNotNull(GetJsonObject(j, jsonPath(k)))),
    // JSONLength: array element count of the field ('' key variants and
    // objects -> 0, CH default contract)
    two("JSONLength")((j, k) =>
      Coalesce(Seq(LengthOfJsonArray(GetJsonObject(j, jsonPath(k))),
        Literal(0))).asInstanceOf[Expression]),
    // multi-level exact quantiles: quantiles(x, l1, l2, …) -> array
    // (CH's parameterized quantiles(l…)(x) syntax can't parse here;
    // levels ride as trailing arguments — same deviation as quantile)
    d("quantiles") { children =>
      require(children.length >= 2,
        "quantiles expects (value, level, level, ...)")
      new Percentile(children.head, CreateArray(children.tail))
        .toAggregateExpression()
    },
    one("medianExact")(c => new Percentile(c, Literal(0.5)).toAggregateExpression()),
    // quantileExactWeighted(x, w[, level]) — CH's weighted exact
    // quantile; weights ride through Percentile's frequency argument
    d("quantileExactWeighted") { children =>
      val (x, wt, level) = children match {
        case Seq(a, w)    => (a, w, Literal(0.5))
        case Seq(a, w, l) => (a, w, l)
        case _ => throw new IllegalArgumentException(
          "quantileExactWeighted expects (value, weight[, level])")
      }
      new Percentile(x, level, Cast(wt, LongType)).toAggregateExpression()
    },
    // uniqCombined: CH's default-tier sketch — same HLL++ backing as uniq
    one("uniqCombined")(c => HyperLogLogPlusPlus(c).toAggregateExpression()),
    // uniqState / uniqMerge — CH's REAGGREGATABLE distinct sketches
    // (the AggregatingMergeTree pattern): uniqState emits a binary
    // HLL sketch per group that can be stored and merged later;
    // uniqMerge unions stored sketches and estimates. Partial rollups
    // (per day / per partition) re-aggregate without touching raw data.
    one("uniqState")(c =>
      HllSketchAgg(c, Literal(12)).toAggregateExpression()),
    one("uniqMerge")(c =>
      HllSketchEstimate(HllUnionAgg(c, Literal(false)).toAggregateExpression())),
    // uniqUpTo(N)(x) -> uniqUpTo(x, N): exact count while <= N, else N+1
    d("uniqUpTo") { children =>
      val (x, n) = children match {
        case Seq(a)     => (a, Literal(100))
        case Seq(a, nn) => (a, nn)
        case _ => throw new IllegalArgumentException(
          "uniqUpTo expects (value[, n])")
      }
      Least(Seq(Count(Seq(x)).toAggregateExpression(isDistinct = true),
        Add(Cast(n, LongType), Literal(1L))))
    },
    one("bitCount")(BitwiseCount(_)),
    // CH editDistance: classic unit-cost Levenshtein (Spark's builtin
    // kernel is the same DP, codegen'd)
    two("editDistance")((a, b) => Levenshtein(a, b)),
    // CH IPv4 string/number conversions — catalyst replicas of the
    // functions/IpFuncs trees (Column-built trees can't splice into a
    // registry builder on Spark 4: they wrap unresolved ColumnNodes)
    one("IPv4NumToString") { n0 =>
      val n = Cast(n0, LongType)
      def oct(shift: Int): Expression = Cast(BitwiseAnd(
        if (shift == 0) n else ShiftRight(n, Literal(shift)),
        Literal(255L)), StringType)
      ConcatWs(Seq(Literal("."), oct(24), oct(16), oct(8), oct(0)))
    },
    one("IPv4StringToNum") { s =>
      // the strict r13-advice contract: exactly four 1-3 digit fields,
      // each ≤ 255, else NULL — the shape gate runs BEFORE any cast so
      // ANSI mode can't throw on garbage (And short-circuits)
      val shaped = RLike(s, Literal("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$"))
      val p = StringSplit(s, Literal("\\."), Literal(-1))
      def oct(i: Int): Expression = Cast(ElementAt(p, Literal(i)), LongType)
      val inRange = (1 to 4).map(i =>
          LessThanOrEqual(oct(i), Literal(255L)): Expression)
        .reduceLeft(And(_, _))
      val value = Add(Add(Add(
        Multiply(oct(1), Literal(16777216L)),
        Multiply(oct(2), Literal(65536L))),
        Multiply(oct(3), Literal(256L))), oct(4))
      CaseWhen(Seq((And(shaped, inRange), value)),
        Literal.create(null, LongType))
    },
    one("hex")(Hex(_)),
    one("unhex")(Unhex(_)),
    // CH MD5 returns FixedString(16) raw bytes; here: lowercase hex
    // (Spark's md5), the form every downstream comparison wants —
    // documented deviation
    one("MD5")(Md5(_)),
    one("groupBitAnd")(c => BitAndAgg(c).toAggregateExpression()),
    one("groupBitOr")(c => BitOrAgg(c).toAggregateExpression()),
    one("groupBitXor")(c => BitXorAgg(c).toAggregateExpression()),
    // exact percentile companion of the t-digest `quantile`
    d("quantileExact") { children =>
      val (x, level) = children match {
        case Seq(a)    => (a, Literal(0.5))
        case Seq(a, l) => (a, l)
        case _ => throw new IllegalArgumentException(
          "quantileExact expects (value) or (value, level)")
      }
      new Percentile(x, level).toAggregateExpression()
    },
    // ClickHouse topK(x, k) -> sketch-based heavy hitters
    d("topK") { children =>
      val (x, k) = children match {
        case Seq(a)     => (a, Literal(10))
        case Seq(a, kk) => (a, kk)
        case _ => throw new IllegalArgumentException(
          "topK expects (value) or (value, k)")
      }
      new ApproxTopK(x, k).toAggregateExpression()
    },
    // row-expanding arrayJoin (CH's explode) + array/string helpers
    one("arrayJoin")(Explode(_)),
    two("has")((arr, x) => ArrayContains(arr, x)),
    // CH higher-order functions take the lambda FIRST: arrayMap(x ->
    // f(x), arr). Spark's parser hands the lambda through as a
    // LambdaFunction child; swap into Spark's (array, lambda) order.
    two("arrayMap")((f, arr) => ArrayTransform(arr, f)),
    two("arrayFilter")((f, arr) => ArrayFilter(arr, f)),
    one("arraySum")(doubleFold),
    // CH vector math, on the fused codegen kernel (DotProductExpr).
    // SQL literals arrive as decimal arrays; DotProductExpr can't use
    // ExpectsInputTypes (sealed outside Spark), so cast to
    // array<double> here — exact for float/int/decimal(≤15) inputs.
    two("arrayDotProduct")((a, b) =>
      graft.functions.DotProductExpr(toDoubleVec(a), toDoubleVec(b))),
    two("cosineDistance") { (a0, b0) =>
      val (a, b) = (toDoubleVec(a0), toDoubleVec(b0))
      val dot = graft.functions.DotProductExpr(a, b)
      Subtract(Literal(1.0), Divide(dot,
        Multiply(Sqrt(graft.functions.DotProductExpr(a, a)),
          Sqrt(graft.functions.DotProductExpr(b, b)))))
    },
    two("L2Distance") { (a, b) =>
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val y = UnresolvedNamedLambdaVariable(Seq("y"))
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val v = UnresolvedNamedLambdaVariable(Seq("v"))
      val fin = UnresolvedNamedLambdaVariable(Seq("fin"))
      val diffs = ZipWith(a, b, LambdaFunction(
        Multiply(Subtract(Cast(x, DoubleType), Cast(y, DoubleType)),
          Subtract(Cast(x, DoubleType), Cast(y, DoubleType))), Seq(x, y)))
      Sqrt(ArrayAggregate(diffs, Literal(0.0),
        LambdaFunction(Add(acc, v), Seq(acc, v)),
        LambdaFunction(fin, Seq(fin))))
    },
    one("arrayDistinct")(ArrayDistinct(_)),
    one("arrayUniq")(c => Size(ArrayDistinct(c))),
    one("arraySort")(SortArray(_, Literal(true))),
    one("arrayReverse")(Reverse(_)),
    d("arrayConcat")(Concat(_)),
    d("arraySlice") { children =>
      children match {
        case Seq(arr, off)      => Slice(arr, off, Size(arr))
        case Seq(arr, off, len) => Slice(arr, off, len)
        case _ => throw new IllegalArgumentException(
          "arraySlice expects (array, offset[, length])")
      }
    },
    two("indexOf")((arr, x) => ArrayPosition(arr, x)),
    one("arrayMin")(ArrayMin(_)),
    one("arrayMax")(ArrayMax(_)),
    // arrayAvg: the arraySum double fold / size — exact for int-valued
    // elements, order-fixed for floats
    one("arrayAvg")(arr =>
      Divide(doubleFold(arr), Cast(Size(arr), DoubleType))),
    // lambda-first predicates, CH argument order. arrayCount can't be
    // Size(ArrayFilter(..)): a user-supplied lambda only resolves when
    // the registered function's ROOT expression is a higher-order
    // function, so the predicate body is spliced into a counting
    // ArrayAggregate instead (the lambda's own variables ride along as
    // the fold's element arguments).
    two("arrayCount")((f, arr) => f match {
      case LambdaFunction(body, args, _) =>
        val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
        val fin = UnresolvedNamedLambdaVariable(Seq("fin"))
        ArrayAggregate(arr, Literal(0),
          LambdaFunction(Add(acc, If(body, Literal(1), Literal(0))), acc +: args),
          LambdaFunction(fin, Seq(fin)))
      case other => Size(ArrayFilter(arr, other))
    }),
    // CH arrayFold(lambda(acc, x), arr, init) — the general fold;
    // Spark's ArrayAggregate merge takes (acc, element) in the same
    // order, so the user lambda splices verbatim
    d("arrayFold") {
      case Seq(f: LambdaFunction, arr, init) =>
        val fin = UnresolvedNamedLambdaVariable(Seq("fin"))
        ArrayAggregate(arr, init, f, LambdaFunction(fin, Seq(fin)))
      case _ => throw new IllegalArgumentException(
        "arrayFold expects (lambda, array, init)")
    },
    two("arrayExists")((f, arr) => ArrayExists(arr, f)),
    two("arrayAll")((f, arr) => ArrayForAll(arr, f)),
    // arrayEnumerate([a,b,c]) = [1,2,3]; the Size>0 guard keeps the
    // empty array from producing sequence(1,0) = [1,0]
    one("arrayEnumerate")(arr =>
      If(GreaterThan(Size(arr), Literal(0)),
        new Sequence(Literal(1), Size(arr), Literal(1)),
        Literal.create(Array.empty[Int], ArrayType(IntegerType)))),
    // arrayDifference: d[0]=0, d[i]=a[i]-a[i-1]. x-x makes a typed zero
    // without knowing the element type; If is lazily evaluated per
    // element, so element_at(arr, 0) never runs (ANSI would throw).
    one("arrayDifference") { arr =>
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val i = UnresolvedNamedLambdaVariable(Seq("i"))
      ArrayTransform(arr, LambdaFunction(
        If(EqualTo(i, Literal(0)), Subtract(x, x),
          Subtract(x, ElementAt(arr, i))), Seq(x, i)))
    },
    // arrayCumSum in the fixed left-to-right double fold (quadratic
    // array build — a compat scalar, not a 100-TB hot path)
    one("arrayCumSum")(cumSumExpr),
    // CH groupArrayMovingSum/Avg: running sum / mean over the group in
    // row order. Order caveat shared with groupArray: collect_list
    // order is partition-dependent — sort upstream for determinism.
    one("groupArrayMovingSum")(x =>
      cumSumExpr(CollectList(x).toAggregateExpression())),
    one("groupArrayMovingAvg") { x =>
      val agg = CollectList(x).toAggregateExpression()
      val cs = UnresolvedNamedLambdaVariable(Seq("cs"))
      val i = UnresolvedNamedLambdaVariable(Seq("i"))
      ArrayTransform(cumSumExpr(agg),
        LambdaFunction(Divide(cs, Cast(Add(i, Literal(1)), DoubleType)),
          Seq(cs, i)))
    },
    // arrayCompact: drop consecutive duplicates (keep first of each run)
    one("arrayCompact") { arr =>
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val i = UnresolvedNamedLambdaVariable(Seq("i"))
      ArrayFilter(arr, LambdaFunction(
        If(EqualTo(i, Literal(0)), Literal(true),
          Not(EqualNullSafe(x, ElementAt(arr, i)))), Seq(x, i)))
    },
    one("arrayFlatten")(Flatten(_)),
    d("arrayZip")(ArraysZip(_)),
    two("arrayIntersect")((a, b) => ArrayIntersect(a, b)),
    two("arrayPushBack")((arr, x) => Concat(Seq(arr, CreateArray(Seq(x))))),
    two("arrayPushFront")((arr, x) => Concat(Seq(CreateArray(Seq(x)), arr))),
    one("arrayPopBack")(arr => Slice(arr, Literal(1), Greatest(Seq(
      Subtract(Size(arr), Literal(1)), Literal(0))))),
    one("arrayPopFront")(arr => Slice(arr, Literal(2), Greatest(Seq(
      Subtract(Size(arr), Literal(1)), Literal(0))))),
    // CH range(n) = [0, …, n-1]; empty for n <= 0
    one("range")(n =>
      If(GreaterThan(n, Literal(0)),
        new Sequence(Literal(0), Subtract(Cast(n, IntegerType), Literal(1)),
          Literal(1)),
        Literal.create(Array.empty[Int], ArrayType(IntegerType)))),
    // arrayReduce('agg', arr) — the aggregate name must be a literal;
    // resolved to the matching fold at plan time
    d("arrayReduce") { children =>
      val Seq(nameE, arr) = children
      val name = nameE match {
        case Literal(u: org.apache.spark.unsafe.types.UTF8String, StringType) =>
          u.toString
        case _ => throw new IllegalArgumentException(
          "arrayReduce expects a literal aggregate name")
      }
      name match {
        case "sum" => doubleFold(arr)
        case "min" => ArrayMin(arr)
        case "max" => ArrayMax(arr)
        case "avg" => Divide(doubleFold(arr), Cast(Size(arr), DoubleType))
        case "count" => Size(arr)
        case "uniqExact" => Size(ArrayDistinct(arr))
        case other => throw new IllegalArgumentException(
          s"arrayReduce: unsupported aggregate '$other'")
      }
    },
    d("arrayStringConcat") { children =>
      children match {
        case Seq(arr)      => ArrayJoin(arr, Literal(""), None)
        case Seq(arr, sep) => ArrayJoin(arr, sep, None)
        case _ => throw new IllegalArgumentException(
          "arrayStringConcat expects (array[, separator])")
      }
    },
    // splitByChar(sep, s) — CH argument order; separator is a literal
    two("splitByChar") { (sep, s) =>
      sep match {
        case Literal(u: org.apache.spark.unsafe.types.UTF8String, StringType) =>
          StringSplit(s, Literal(java.util.regex.Pattern.quote(u.toString)),
            Literal(-1))
        case _ => throw new IllegalArgumentException(
          "splitByChar expects a literal separator")
      }
    },
    // multiIf(c1, v1, c2, v2, …, else) -> CASE WHEN
    d("multiIf") { children =>
      require(children.length >= 3 && children.length % 2 == 1,
        "multiIf expects (cond, value)... pairs plus a final else")
      val branches = children.dropRight(1).grouped(2)
        .map { case Seq(c, v) => (c, v) }.toSeq
      CaseWhen(branches, Some(children.last))
    },
    one("empty")(graft.functions.EmptyLike(_, negate = false)),
    one("notEmpty")(graft.functions.EmptyLike(_, negate = true)),
    one("lengthUTF8")(Length(_)),
    // toYYYYMM: the CH partition-key idiom
    one("toYYYYMM")(c =>
      Cast(new DateFormatClass(c, Literal("yyyyMM")), IntegerType)),
    one("toYYYYMMDD")(c =>
      Cast(new DateFormatClass(c, Literal("yyyyMMdd")), IntegerType)),
    // CH temporal component extractors
    one("toYear")(Year(_)),
    one("toMonth")(Month(_)),
    one("toDayOfMonth")(DayOfMonth(_)),
    one("toDayOfYear")(DayOfYear(_)),
    one("toHour")(Hour(_)),
    one("toMinute")(Minute(_)),
    one("toSecond")(Second(_)),
    // CH toDayOfWeek: Monday=1 … Sunday=7 (Spark WeekDay is Monday=0)
    one("toDayOfWeek")(c => Add(WeekDay(c), Literal(1))),
    one("toUnixTimestamp")(c =>
      new UnixTimestamp(c, Literal("yyyy-MM-dd HH:mm:ss"))),
    two("intDiv")((a, b) => IntegralDivide(a, b)),
    two("modulo")((a, b) => Remainder(a, b)),
    // NOTE: CH's dateDiff('day', s, e) cannot be registered — Spark's
    // parser special-cases the dateDiff/datediff name and rejects quoted
    // units before any injected builder runs. The same capability is
    // native Spark SQL: timestampdiff(DAY, s, e) (documented deviation).
    // array/first-last aggregates
    one("groupArray")(c => CollectList(c).toAggregateExpression()),
    one("groupUniqArray")(c => CollectSet(c).toAggregateExpression()),
    one("any")(c => First(c, ignoreNulls = true).toAggregateExpression()),
    one("anyLast")(c => Last(c, ignoreNulls = true).toAggregateExpression()),
    // quantile(x[, level]) -> t-digest approximate percentile. CH's
    // parameterized quantile(level)(x) syntax can't parse here, so the
    // level is a second argument (documented deviation).
    d("quantile") { children =>
      val (x, level) = children match {
        case Seq(a)    => (a, Literal(0.5))
        case Seq(a, l) => (a, l)
        case _ => throw new IllegalArgumentException(
          "quantile expects (value) or (value, level)")
      }
      new ApproximatePercentile(x, level).toAggregateExpression()
    },
    // --- CH temporal helpers (round 4) ---
    // toStartOfWeek: CH default mode 0 = SUNDAY-start (toMonday is the
    // Monday one); both return Date
    one("toStartOfWeek")(c =>
      DateSub(Cast(c, DateType), Subtract(DayOfWeek(Cast(c, DateType)), Literal(1)))),
    one("toMonday")(c => TruncDate(Cast(c, DateType), Literal("week"))),
    one("toStartOfQuarter")(c => TruncDate(Cast(c, DateType), Literal("quarter"))),
    one("toStartOfYear")(c => TruncDate(Cast(c, DateType), Literal("year"))),
    one("toQuarter")(Quarter(_)),
    one("toISOWeek")(WeekOfYear(_)),
    // add*/subtract*: CH preserves Date-ness on Date inputs; here Date
    // widens to DateTime for sub-day units and stays Date via the
    // TimestampAdd implicit cast — documented deviation for the Date+
    // hours case only
    two("addDays")((t, n) => new TimestampAdd("DAY", n, t)),
    two("addHours")((t, n) => new TimestampAdd("HOUR", n, t)),
    two("addMinutes")((t, n) => new TimestampAdd("MINUTE", n, t)),
    two("addSeconds")((t, n) => new TimestampAdd("SECOND", n, t)),
    two("addMonths")((t, n) => new TimestampAdd("MONTH", n, t)),
    two("addYears")((t, n) => new TimestampAdd("YEAR", n, t)),
    two("subtractDays")((t, n) => new TimestampAdd("DAY", UnaryMinus(n), t)),
    two("subtractHours")((t, n) => new TimestampAdd("HOUR", UnaryMinus(n), t)),
    two("subtractMonths")((t, n) => new TimestampAdd("MONTH", UnaryMinus(n), t)),
    two("subtractYears")((t, n) => new TimestampAdd("YEAR", UnaryMinus(n), t)),
    // --- CH URL function family (all return '' on a missing part,
    // CH's default-value contract, vs parse_url's NULL) ---
    // Every function reads a field of the fused single-parse
    // [[graft.functions.UrlPartsExpr]] struct (round 18): N URL
    // functions over the same url expression share one identical
    // url_parts(u) subtree, which codegen subexpression elimination
    // evaluates ONCE per row instead of N `new URI(u)` parses. Field
    // values replay parse_url's exact semantics (spec-pinned).
    one("protocol")(u => orEmpty(urlField(u, graft.functions.UrlParts.Protocol))),
    one("domain")(u => orEmpty(urlField(u, graft.functions.UrlParts.Host))),
    one("domainWithoutWWW")(u =>
      orEmpty(RegExpReplace(urlField(u, graft.functions.UrlParts.Host),
        Literal("^www\\."), Literal("")))),
    // TLD of the host, without the dot; '' when the host has none
    one("topLevelDomain")(u =>
      orEmpty(RegExpExtract(urlField(u, graft.functions.UrlParts.Host),
        Literal("\\.([^.]+)$"), Literal(1)))),
    one("path")(u => orEmpty(urlField(u, graft.functions.UrlParts.Path))),
    one("queryString")(u => orEmpty(urlField(u, graft.functions.UrlParts.Query))),
    one("fragment")(u => orEmpty(urlField(u, graft.functions.UrlParts.Ref))),
    // literal key: the exact ParseUrlEvaluator pattern ("(&|^)" + key +
    // "=([^&]*)", group 2, raw unquoted key) over the fused query
    // field; regexp_extract's ''-on-no-match and parse_url's
    // null-on-no-match converge under the orEmpty wrapper. Non-literal
    // keys keep the stock parse_url form.
    two("extractURLParameter")((u, k) => k match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        orEmpty(RegExpExtract(urlField(u, graft.functions.UrlParts.Query),
          Literal("(&|^)" + s.toString + "=([^&]*)"), Literal(2)))
      case _ => orEmpty(ParseUrl(Seq(u, Literal("QUERY"), k), failOnError = false))
    }),
    // --- CH string functions ---
    // position(haystack, needle) — CH argument order; 1-based, 0 = miss
    two("position")((h, n) => new StringLocate(n, h)),
    two("positionCaseInsensitive")((h, n) =>
      new StringLocate(Lower(n), Lower(h))),
    d("replaceAll") { children =>
      require(children.length == 3, "replaceAll expects (s, from, to)")
      StringReplace(children(0), children(1), children(2))
    },
    d("replaceRegexpAll") { children =>
      require(children.length == 3,
        "replaceRegexpAll expects (s, pattern, replacement)")
      RegExpReplace(children(0), children(1), children(2))
    },
    // extract/extractAll: CH returns the first capture group when the
    // pattern has one, else the whole match — resolvable at build time
    // for literal patterns (group count inspected), group 0 otherwise
    two("extract")((s, re) => RegExpExtract(s, re, chGroupIdx(re))),
    two("extractAll")((s, re) => RegExpExtractAll(s, re, chGroupIdx(re))),
    d("leftPad") { children =>
      val Seq(s, len, pad) = padArgs("leftPad", children)
      StringLPad(s, len, pad)
    },
    d("rightPad") { children =>
      val Seq(s, len, pad) = padArgs("rightPad", children)
      StringRPad(s, len, pad)
    },
    two("startsWith")((s, p) => StartsWith(s, p)),
    two("endsWith")((s, p) => EndsWith(s, p)),
    one("lowerUTF8")(Lower(_)),
    one("upperUTF8")(Upper(_)))

  private def toDoubleVec(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  // failOnError=false semantics: a malformed URL yields a NULL struct
  // -> NULL field -> '' via orEmpty (CH's contract), instead of ANSI's
  // INVALID_URL error
  private def urlField(u: Expression, idx: Int): Expression =
    GetStructField(graft.functions.UrlPartsExpr(u), idx,
      Some(graft.functions.UrlParts.schema(idx).name))

  private def orEmpty(e: Expression): Expression =
    Coalesce(Seq(e, Literal("")))

  /** CH extract/extractAll group choice: first capture group if the
    * (literal) pattern declares one, else the whole match.
    */
  private def chGroupIdx(re: Expression): Expression = re match {
    case Literal(u: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      val n = java.util.regex.Pattern.compile(u.toString).matcher("").groupCount()
      Literal(if (n > 0) 1 else 0)
    case _ => Literal(0)
  }

  private def padArgs(name: String, children: Seq[Expression]): Seq[Expression] =
    children match {
      case Seq(s, len)      => Seq(s, len, Literal(" "))
      case Seq(s, len, pad) => Seq(s, len, pad)
      case _ => throw new IllegalArgumentException(
        s"$name expects (s, length[, pad])")
    }

  /** Running double sums of an array (the arrayCumSum body, shared by
    * the groupArrayMoving* aggregates). Round 18: the declarative
    * `aggregate(..., concat(acc, [last + x]))` fold rebuilt the
    * accumulator array per element — O(n²) copies through an
    * interpreted lambda; [[graft.functions.CumSumDoubleExpr]] is the
    * linear fused kernel with the identical per-element IEEE adds and
    * NULL propagation.
    */
  private def cumSumExpr(arr: Expression): Expression =
    graft.functions.CumSumDoubleExpr(arr)

  /** Left-to-right double sum fold over an array — the one fixed
    * accumulation order every sum-like compat function shares (and the
    * DuckDB oracles mirror).
    */
  private def doubleFold(arr: Expression): Expression =
    // round 18: fused linear kernel, bit-identical to
    // `aggregate(arr, 0d, (acc, x) -> acc + double(x))` (same adds,
    // same order, NULL element nulls the sum) without the interpreted
    // per-element lambda — see [[graft.functions.DoubleFoldExpr]]
    graft.functions.DoubleFoldExpr(arr)

  private def two(name: String)(f: (Expression, Expression) => Expression): FunctionDescriptor =
    d(name) { children =>
      require(children.length == 2, s"$name expects exactly two arguments")
      f(children(0), children(1))
    }

  /** CH passes a bare field name; JsonPath wants `$.name`. Fold the
    * literal at registration when possible, else concat at runtime.
    */
  private def jsonPath(key: Expression): Expression = key match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString("$." + s.toString), StringType)
    case e => Concat(Seq(Literal("$."), e))
  }

  /** Register on an already-built session (tests, notebooks). */
  def install(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}

/** SQL-first catalog surface: expose every test-schema table under its
  * name so the whole OLAP surface is reachable via `spark.sql` — the
  * experience a ClickHouse user migrating to this engine expects.
  */
object GraftCatalog {
  /** Last dir registered per session — registration is idempotent for
    * a given dir (the views are pure references to immutable parquet
    * paths, no data or results cached), and re-running it on every
    * CH-SQL gate CONSTRUCTION paid ten parquet-footer reads per query
    * invocation (~0.4 s each, measured as ten ~40 ms mini-jobs before
    * the gate's real work — r17 JobProfile receipt). Re-registers
    * whenever the dir changes, so warm-up at sf0.001 and timed runs at
    * sf0.1 each see their own tables.
    */
  // WEAK session keys (ADVICE r17): a strong map would retain every
  // short-lived session forever; synchronizedMap because WeakHashMap
  // is not thread-safe
  private val registeredDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def registerTables(spark: SparkSession, dir: String): Unit = {
    GraftExtensions.install(spark)
    // re-register when the dir changed OR a caller dropped/shadowed a
    // canonical view since the memo was taken (ADVICE r17 — the old
    // always-restore behavior, at the cost of one catalog lookup per
    // table on the memo hit)
    val allPresent = registeredDir.get(spark) == dir &&
      Tables.all.forall(t => spark.catalog.tableExists(t))
    if (!allPresent) {
      Tables.all.foreach { t =>
        val df = t match {
          case "events" => Tables.events(spark, dir)
          case other    => Tables(spark, dir, other)
        }
        df.createOrReplaceTempView(t)
      }
      registeredDir.put(spark, dir)
    }
  }
}
