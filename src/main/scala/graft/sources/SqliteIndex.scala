package graft.sources

import SqliteFile._

/** Secondary-index point AND range lookups over a SQLite database
  * file — the access path sqlite itself takes for `WHERE col = ?` /
  * `col BETWEEN ? AND ?` when a `CREATE INDEX` covers the column,
  * re-implemented from the public file-format doc (fileformat2
  * §1.6/§2.3) with zero drivers, like the rest of the [[SqliteFile]]
  * reader. Equality is the degenerate closed range; the walk is
  * [[rangeRowids]] either way.
  *
  * Shape: an index b-tree's cells are records `(indexed cols...,
  * rowid)` in key order; interior cells carry BOTH a child pointer
  * and a full record (index interiors are not blind separators the
  * way table interiors are). An equality probe therefore:
  *
  *   1. descends only children whose key interval can contain the
  *      target — O(log n + matches) pages, the receipt
  *      [[indexRowids]] returns;
  *   2. collects the trailing rowid of every matching record
  *      (interior AND leaf cells — both hold real entries);
  *   3. point-fetches each rowid from the TABLE b-tree via the
  *      bounded walk (rowid−1, rowid] — O(depth) pages per row,
  *      the same pruning the CDC reader proved.
  *
  * This is a driver-side point-read primitive (the dictGet/dim-probe
  * shape), NOT a scan: a query needing many keys should read the
  * table once and join. The DSv2 scan wires it up for single-key
  * equality pushdown.
  *
  * Round 15 widened the walk to the refusals a real sqlite3 serves
  * natively (the r14 verdict's "adjacent 20%"): DESC index columns
  * (the same walk with that column's comparisons flipped — the
  * descent runs entirely in INDEX order), COLLATE NOCASE (ASCII
  * case-fold before memcmp — sqlite's own NOCASE definition, ASCII
  * only), and composite second-column bounds (`a = ? AND b BETWEEN
  * ? AND ?` binds both columns into the descent — the matching keys
  * are one contiguous index segment, so the walk is still
  * O(log n + matches) pages).
  *
  * Named refusals (loud, never silent garbage):
  *  - expression / partial indexes — their key order is not any
  *    column's;
  *  - COLLATE other than BINARY / NOCASE (RTRIM and custom
  *    collations are not implemented);
  *  - sqlite_autoindex internal indexes (no SQL to validate against);
  *  - non-UTF-8 databases for TEXT probes — collation is defined on
  *    the DATABASE encoding's bytes, and this comparator works on
  *    UTF-8;
  *  - WITHOUT ROWID tables (their index entries end in PK columns,
  *    not a rowid);
  *  - NULL probes (SQL equality never matches NULL).
  */
object SqliteIndex {

  /** One indexed column: name + the modifiers that change key order.
    * NOCASE equality is the COLLATION's equality ('Foo' = 'foo'), the
    * same semantics sqlite gives a probe served by a NOCASE index.
    */
  final case class ColSpec(name: String, desc: Boolean = false,
                           nocase: Boolean = false)

  /** One CREATE INDEX row from sqlite_master. `specs` carry the
    * per-column order/collation when the index is supported (`cols`
    * is the name projection); `refusal` carries the named reason when
    * it is not (parsed eagerly so listIndexes can show WHY an index
    * is unusable).
    */
  final case class IndexDef(name: String, table: String, rootPage: Int,
                            specs: Seq[ColSpec], unique: Boolean,
                            sql: String, refusal: Option[String]) {
    def supported: Boolean = refusal.isEmpty
    def cols: Seq[String] = specs.map(_.name)
  }

  /** All indexes in the file (internal sqlite_autoindex entries
    * included, marked refused — they exist and hiding them would make
    * "why is my PK probe slow" undiagnosable).
    */
  def listIndexes(path: String): Seq[IndexDef] = {
    val h = header(path)
    val w = new TableWalk(path, h, 1)
    try {
      w.map(_._2).collect {
        case vals if vals.headOption.contains("index") =>
          val name = vals(1).asInstanceOf[String]
          val tbl = vals(2).asInstanceOf[String]
          val root = vals(3).asInstanceOf[Long].toInt
          val sql = vals(4) match { case s: String => s; case _ => null }
          if (sql == null)
            IndexDef(name, tbl, root, Nil, unique = true, null,
              Some("internal sqlite_autoindex (no SQL; use the table's " +
                "declared PK access path instead)"))
          else {
            val (cols, unique, refusal) = parseCreateIndex(sql)
            IndexDef(name, tbl, root, cols, unique, sql, refusal)
          }
      }.toList
    } finally w.close()
  }

  /** Parse `CREATE [UNIQUE] INDEX ... ON tbl(colspec, ...)`; returns
    * (column specs, unique, refusal). DESC and COLLATE NOCASE/BINARY
    * modifiers are supported (round 15); anything else refuses by
    * name.
    */
  private[sources] def parseCreateIndex(
      sql: String): (Seq[ColSpec], Boolean, Option[String]) = {
    val unique = sql.toUpperCase.matches("(?s)\\s*CREATE\\s+UNIQUE\\s+INDEX.*")
    val open = sql.indexOf('(')
    val close = sql.lastIndexOf(')')
    if (open < 0 || close < open)
      return (Nil, unique, Some("unparseable CREATE INDEX sql"))
    val trailer = sql.substring(close + 1).trim.toUpperCase
    if (trailer.startsWith("WHERE"))
      return (Nil, unique, Some("partial index (WHERE clause): its " +
        "entries cover only the predicate's rows"))
    val specTexts = splitTopLevel(sql.substring(open + 1, close))
    val cols = scala.collection.mutable.ArrayBuffer.empty[ColSpec]
    for (spec0 <- specTexts) {
      val spec = spec0.trim
      if (spec.contains("("))
        return (Nil, unique, Some(s"expression index term '$spec': key " +
          "order is the expression's, not any column's"))
      val parts = tokenize(spec)
      if (parts.isEmpty)
        return (Nil, unique, Some("empty index column spec"))
      val name = unq(parts.head)
      var desc = false
      var nocase = false
      var i = 1
      while (i < parts.size) {
        parts(i).toUpperCase match {
          case "ASC" =>
          case "DESC" => desc = true
          case "COLLATE" =>
            if (i + 1 >= parts.size)
              return (Nil, unique, Some(s"dangling COLLATE on '$name'"))
            unq(parts(i + 1)).toUpperCase match {
              case "BINARY" =>
              case "NOCASE" => nocase = true
              case other => return (Nil, unique, Some(
                s"COLLATE $other on index column '$name': only BINARY " +
                  "and NOCASE collations are implemented"))
            }
            i += 1
          case other => return (Nil, unique, Some(
            s"unrecognized index column modifier on '$name': $other"))
        }
        i += 1
      }
      cols += ColSpec(name, desc, nocase)
    }
    (cols.toSeq, unique, None)
  }

  private def tokenize(s: String): Seq[String] = {
    // quoted identifier first, then bare words
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '"' || c == '\'' || c == '`' || c == '[') {
        val end = if (c == '[') ']' else c
        val j = s.indexOf(end, i + 1)
        require(j > i, s"unterminated quote in index spec: $s")
        out += s.substring(i, j + 1)
        i = j + 1
      } else {
        var j = i
        while (j < s.length && !s(j).isWhitespace) j += 1
        out += s.substring(i, j)
        i = j
      }
    }
    out.toSeq
  }

  private def unq(t: String): String =
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
        (t.head == '\'' && t.last == '\'') ||
        (t.head == '`' && t.last == '`') ||
        (t.head == '[' && t.last == ']')))
      t.substring(1, t.length - 1)
    else t

  /** sqlite BINARY-collation comparison of two decoded key values:
    * NULL < numeric (INTEGER and REAL cross-compare numerically) <
    * TEXT (memcmp of UTF-8 bytes) < BLOB (memcmp).
    */
  private[sources] def cmpKey(a: Any, b: Any): Int = {
    def rank(v: Any): Int = v match {
      case null => 0
      case _: Long | _: Double => 1
      case _: String => 2
      case _: Array[Byte] => 3
      case other => throw new IllegalStateException(
        s"unexpected index key type ${other.getClass.getSimpleName}")
    }
    val (ra, rb) = (rank(a), rank(b))
    if (ra != rb) Integer.compare(ra, rb)
    else (a, b) match {
      case (null, null) => 0
      case (x: Long, y: Long) => java.lang.Long.compare(x, y)
      case (x: Double, y: Double) => java.lang.Double.compare(x, y)
      case (x: Long, y: Double) =>
        java.math.BigDecimal.valueOf(x)
          .compareTo(java.math.BigDecimal.valueOf(y))
      case (x: Double, y: Long) => -cmpKey(y, x)
      case (x: String, y: String) =>
        memcmp(x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (x: Array[Byte], y: Array[Byte]) => memcmp(x, y)
      case _ => throw new IllegalStateException("unreachable")
    }
  }

  private def memcmp(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** sqlite NOCASE: fold ASCII A-Z to a-z (ONLY ASCII — sqlite's own
    * built-in NOCASE definition), then memcmp. Non-ASCII bytes
    * compare raw.
    */
  private def foldByte(b: Byte): Int = {
    val u = b & 0xff
    if (u >= 'A' && u <= 'Z') u + 32 else u
  }

  private def memcmpFold(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = foldByte(a(i)) - foldByte(b(i))
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** ASCII case-fold of a string — the value-space image a NOCASE
    * probe compares in (used by the DSv2 layer to build fold-space
    * prefix ranges).
    */
  private[sources] def foldAscii(s: String): String =
    s.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)

  /** [[cmpKey]] under a column's collation: NOCASE folds ASCII before
    * the TEXT memcmp; every other type ranks/compares as BINARY.
    */
  private[sources] def cmpKeyColl(a: Any, b: Any, nocase: Boolean): Int =
    if (!nocase) cmpKey(a, b)
    else (a, b) match {
      case (x: String, y: String) =>
        memcmpFold(x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case _ => cmpKey(a, b)
    }

  private def checkProbe(path: String, h: Header, idx: IndexDef,
                         value: Any): Unit = {
    idx.refusal.foreach(r => throw new IllegalArgumentException(
      s"index ${idx.name} is unusable: $r"))
    require(value != null,
      "NULL probe: SQL equality never matches NULL - filter IS NULL " +
        "via a table scan")
    value match {
      case _: Long | _: Double =>
      case _: String =>
        require(h.encoding == 1,
          s"TEXT probe on a non-UTF-8 database (encoding ${h.encoding}): " +
            "BINARY collation is memcmp in the database encoding and " +
            "this comparator memcmps UTF-8")
      case other => throw new IllegalArgumentException(
        s"unsupported probe type ${other.getClass.getSimpleName}: " +
          "Long, Double and String keys are implemented")
    }
  }

  /** A one-sided-or-closed interval over the leading indexed column —
    * the range a `WHERE col > lo AND col <= hi` conjunction pushes
    * down. `None` = unbounded on that side. Bounds are keys in the
    * [[cmpKey]] order (NULL keys sort below every bound, so an index
    * range never returns NULL-keyed entries — matching SQL comparison
    * semantics, where `col > x` is never true for NULL).
    */
  final case class KeyRange(lo: Option[Any], loInc: Boolean,
                            hi: Option[Any], hiInc: Boolean)
      extends Serializable {
    def contains(key: Any): Boolean = {
      if (key == null) return false // SQL comparisons never match NULL
      val okLo = lo.forall { l =>
        val c = cmpKey(key, l); c > 0 || (loInc && c == 0)
      }
      val okHi = hi.forall { h =>
        val c = cmpKey(key, h); c < 0 || (hiInc && c == 0)
      }
      okLo && okHi
    }
    /** key is strictly past the upper bound (sorted-order early stop). */
    def pastHi(key: Any): Boolean =
      key != null && hi.exists { h =>
        val c = cmpKey(key, h); c > 0 || (!hiInc && c == 0)
      }
    override def toString: String =
      s"${if (loInc) "[" else "("}${lo.getOrElse("-inf")}, " +
        s"${hi.getOrElse("+inf")}${if (hiInc) "]" else ")"}"
  }

  /** Rowids whose leading indexed column falls in `range`, plus the
    * pages-touched receipt. Degenerate composite walk (no equality
    * prefix); see [[compositeRangeRowids]].
    */
  def rangeRowids(path: String, h: Header, idx: IndexDef,
                  range: KeyRange): (Seq[Long], Int) =
    compositeRangeRowids(path, h, idx, Nil, range)

  /** Rowids matching `leading columns = eqPrefix AND specs(m) ∈ range`
    * (m = eqPrefix.length), plus the pages-touched receipt — the
    * composite-index descent sqlite runs for
    * `a = ? AND b BETWEEN ? AND ?` on `CREATE INDEX ... (a, b)`.
    *
    * O(log n + matches) pages: the matching keys are ONE contiguous
    * segment of index order (equality prefix, then a range on the
    * next column — each column mirrored independently when DESC), so
    * children are descended only when their key interval can
    * intersect the segment's closed hull. Descent margins are
    * INCLUSIVE regardless of bound openness — duplicate keys can span
    * children, and one extra edge subtree is cheaper than a wrong
    * skip; entry membership is exact (value-space, per-column
    * collation).
    *
    * All comparisons against the tree run in INDEX order
    * ([[cmpKeyColl]] per column, sign-flipped for DESC columns), so
    * DESC and NOCASE columns take the identical walk.
    */
  def compositeRangeRowids(path: String, h: Header, idx: IndexDef,
                           eqPrefix: Seq[Any],
                           range: KeyRange): (Seq[Long], Int) = {
    (eqPrefix ++ range.lo.toSeq ++ range.hi.toSeq)
      .foreach(v => checkProbe(path, h, idx, v))
    require(eqPrefix.nonEmpty || range.lo.nonEmpty || range.hi.nonEmpty,
      "unbounded range probe: scan the table instead")
    val m = eqPrefix.length // position of the ranged column
    require(idx.specs.length > m,
      s"index ${idx.name} has ${idx.specs.length} columns; a " +
        s"${m}-column equality prefix leaves no ranged column")
    val specs = idx.specs.toIndexedSeq
    val eq = eqPrefix.toIndexedSeq

    // Index-order comparison of an entry's key prefix against a bound
    // vector (≤ m+1 values): per-column collation compare, sign
    // flipped for DESC columns, first nonzero wins; prefix-equal → 0.
    def cmpVec(rec: IndexedSeq[Any], bound: IndexedSeq[Any]): Int = {
      var i = 0
      while (i < bound.length) {
        var c = cmpKeyColl(rec(i), bound(i), specs(i).nocase)
        if (specs(i).desc) c = -c
        if (c != 0) return c
        i += 1
      }
      0
    }

    // The segment's index-order endpoints: the eq prefix plus the
    // range end that comes FIRST/LAST in the ranged column's own
    // direction (a DESC column mirrors lo/hi). A missing end leaves
    // the prefix-only bound (every continuation of the prefix is in
    // the hull); no prefix and no end → unbounded on that side.
    val (startV, endV) =
      if (!specs(m).desc) (range.lo, range.hi) else (range.hi, range.lo)
    def mkBound(v: Option[Any]): Option[IndexedSeq[Any]] = v match {
      case Some(x) => Some(eq :+ x)
      case None => if (eq.nonEmpty) Some(eq) else None
    }
    val idxLo = mkBound(startV)
    val idxHi = mkBound(endV)

    // Exact value-space membership: every eq column collation-equal,
    // the ranged column in `range` with its collation and exact
    // openness. NULL never matches a comparison (SQL semantics).
    def containsRec(rec: IndexedSeq[Any]): Boolean = {
      var i = 0
      while (i < m) {
        val v = rec(i)
        if (v == null || cmpKeyColl(v, eq(i), specs(i).nocase) != 0)
          return false
        i += 1
      }
      val kv = rec(m)
      if (kv == null) return false
      val okLo = range.lo.forall { l =>
        val c = cmpKeyColl(kv, l, specs(m).nocase)
        c > 0 || (range.loInc && c == 0)
      }
      val okHi = range.hi.forall { hb =>
        val c = cmpKeyColl(kv, hb, specs(m).nocase)
        c < 0 || (range.hiInc && c == 0)
      }
      okLo && okHi
    }

    val pf = new PageFile(path, h)
    val cs = charsetOf(h.encoding)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]

    def rowidOf(rec: IndexedSeq[Any]): Long = rec.last match {
      case l: Long => l
      case other => throw new IllegalStateException(
        s"index ${idx.name}: entry does not end in an integer rowid " +
          s"(${if (other == null) "null" else other.getClass.getSimpleName}) " +
          "- WITHOUT ROWID table indexes are not supported")
    }

    // Closed-hull descent tests in INDEX order (see scaladoc).
    def beforeStart(rec: IndexedSeq[Any]): Boolean =
      idxLo.exists(b => cmpVec(rec, b) < 0)
    def pastEnd(rec: IndexedSeq[Any]): Boolean =
      idxHi.exists(b => cmpVec(rec, b) > 0)

    def visit(pageNo: Int): Unit = {
      val pg = pf.page(pageNo)
      val off = if (pageNo == 1) 100 else 0
      val tpe = pg(off) & 0xff
      val k = be(pg, off + 3, 2).toInt
      tpe match {
        case 0x0a => // leaf index: sorted cells, early stop past end
          var i = 0
          var stop = false
          while (i < k && !stop) {
            val c = be(pg, off + 8 + 2 * i, 2).toInt
            val (p, n1) = varint(pg, c)
            val rec = record(payload(pf, pg, c, p, c + n1, index = true), cs)
            if (containsRec(rec)) out += rowidOf(rec)
            if (pastEnd(rec)) stop = true
            i += 1
          }
        case 0x02 => // interior index: records AND children
          var prevPastEnd = false // -inf before cell 0 is never past
          var i = 0
          while (i < k && !prevPastEnd) {
            val c = be(pg, off + 12 + 2 * i, 2).toInt
            val child = be(pg, c, 4).toInt
            val (p, n1) = varint(pg, c + 4)
            val rec = record(payload(pf, pg, c, p, c + 4 + n1, index = true), cs)
            if (!beforeStart(rec)) visit(child) // child max >= start hull
            if (containsRec(rec)) out += rowidOf(rec)
            prevPastEnd = pastEnd(rec)
            i += 1
          }
          // rightmost child covers (lastKey, +inf) in index order
          if (!prevPastEnd) visit(be(pg, off + 8, 4).toInt)
        case other => throw new IllegalStateException(
          s"page $pageNo: expected an index b-tree page, got type $other " +
            "- the sqlite_master rootpage does not point at an index")
      }
    }

    try {
      visit(idx.rootPage)
      (out.toSeq, pf.reads)
    } finally pf.close()
  }

  /** Rowids whose leading indexed column equals `value`, plus the
    * pages-touched receipt. O(depth + matches) pages: children are
    * descended only when their key interval can contain the target.
    */
  def indexRowids(path: String, idx: IndexDef, value: Any): (Seq[Long], Int) =
    indexRowids(path, header(path), idx, value)

  /** As above with a caller-snapshotted header — the DSv2 scan passes
    * the plan-time header so every task of one batch sees the same
    * committed WAL/journal overlay (the SqliteSubtrees discipline).
    * Equality is the degenerate closed range [v, v]: the range walk's
    * descent decisions are IDENTICAL to the original point walk
    * (closed hull ≡ prev ≤ v ∧ cur ≥ v), so the spec-pinned
    * pages-touched receipts are unchanged.
    */
  def indexRowids(path: String, h: Header, idx: IndexDef,
                  value: Any): (Seq[Long], Int) =
    rangeRowids(path, h, idx,
      KeyRange(Some(value), loInc = true, Some(value), hiInc = true))

  /** Equality point lookup: index probe + per-rowid bounded table
    * fetch. Returns (rows as raw (rowid, record values), index pages,
    * table pages) — callers map records through the TableDef exactly
    * like [[SqliteFile.read]] does.
    */
  def lookupRaw(path: String, table: TableDef, idx: IndexDef,
                value: Any): (Seq[(Long, IndexedSeq[Any])], Int, Int) = {
    require(idx.table == table.name,
      s"index ${idx.name} is on table ${idx.table}, not ${table.name}")
    require(!table.withoutRowid,
      s"table ${table.name} is WITHOUT ROWID: its index entries end in " +
        "PK columns, not rowids - use the table b-tree's own key order")
    val (rowids, idxPages) = indexRowids(path, idx, value)
    val h = header(path)
    var tblPages = 0
    val rows = rowids.sorted.map { rid =>
      val w = new TableWalk(path, h, table.rootPage, rid - 1, rid)
      try {
        require(w.hasNext, s"index ${idx.name} points at rowid $rid " +
          s"absent from table ${table.name} - corrupt or torn file")
        val r = w.next()
        tblPages += w.pagesRead
        r
      } finally w.close()
    }
    (rows, idxPages, tblPages)
  }

  /** Equality point lookup surfaced as schema-correct Spark Rows
    * (driver-side — this is a point-read primitive, not a scan).
    */
  def lookup(path: String, table: TableDef, idx: IndexDef,
             value: Any): Seq[org.apache.spark.sql.Row] = {
    val (raw, _, _) = lookupRaw(path, table, idx, value)
    val cols = table.columns.toIndexedSeq
    val recIdx = table.recordIndex
    raw.map { case (rowid, vals) =>
      org.apache.spark.sql.Row.fromSeq(cols.zipWithIndex.map {
        case (c, i) =>
          val src = recIdx(i)
          if (c.rowidAlias) rowid
          else if (src < vals.size) coerceValue(vals(src), c, table.name)
          else null
      })
    }
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var quote: Char = 0; var i = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) {
        cur += c; if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case '[' => quote = ']'; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}
