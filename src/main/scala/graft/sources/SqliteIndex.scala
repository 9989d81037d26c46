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
  * Named refusals (loud, never silent garbage):
  *  - expression / partial / DESC / COLLATE indexes — their key order
  *    is not the plain column order this walk assumes;
  *  - sqlite_autoindex internal indexes (no SQL to validate against);
  *  - non-UTF-8 databases for TEXT probes — BINARY collation is
  *    memcmp in the DATABASE encoding, and this comparator memcmps
  *    UTF-8 bytes;
  *  - WITHOUT ROWID tables (their index entries end in PK columns,
  *    not a rowid);
  *  - NULL probes (SQL equality never matches NULL).
  */
object SqliteIndex {

  /** One CREATE INDEX row from sqlite_master. `cols` are the plain
    * column names when the index is supported; `refusal` carries the
    * named reason when it is not (parsed eagerly so listIndexes can
    * show WHY an index is unusable).
    */
  final case class IndexDef(name: String, table: String, rootPage: Int,
                            cols: Seq[String], unique: Boolean,
                            sql: String, refusal: Option[String]) {
    def supported: Boolean = refusal.isEmpty
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
    * (leading column names, unique, refusal). Any colspec that is not
    * a bare (possibly quoted) ASC column name refuses by name.
    */
  private[sources] def parseCreateIndex(
      sql: String): (Seq[String], Boolean, Option[String]) = {
    val unique = sql.toUpperCase.matches("(?s)\\s*CREATE\\s+UNIQUE\\s+INDEX.*")
    val open = sql.indexOf('(')
    val close = sql.lastIndexOf(')')
    if (open < 0 || close < open)
      return (Nil, unique, Some("unparseable CREATE INDEX sql"))
    val trailer = sql.substring(close + 1).trim.toUpperCase
    if (trailer.startsWith("WHERE"))
      return (Nil, unique, Some("partial index (WHERE clause): its " +
        "entries cover only the predicate's rows"))
    val specs = splitTopLevel(sql.substring(open + 1, close))
    val cols = scala.collection.mutable.ArrayBuffer.empty[String]
    for (spec0 <- specs) {
      val spec = spec0.trim
      if (spec.contains("("))
        return (Nil, unique, Some(s"expression index term '$spec': key " +
          "order is the expression's, not any column's"))
      val parts = tokenize(spec)
      if (parts.isEmpty)
        return (Nil, unique, Some("empty index column spec"))
      val name = unq(parts.head)
      val mods = parts.tail.map(_.toUpperCase)
      if (mods.contains("DESC"))
        return (Nil, unique, Some(s"DESC index column '$name': this " +
          "walk assumes ascending key order"))
      if (mods.contains("COLLATE"))
        return (Nil, unique, Some(s"COLLATE on index column '$name': " +
          "only BINARY collation memcmp is implemented"))
      if (mods.nonEmpty && !mods.forall(_ == "ASC"))
        return (Nil, unique, Some(s"unrecognized index column modifier " +
          s"on '$name': ${mods.mkString(" ")}"))
      cols += name
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
    * pages-touched receipt. O(log n + matches) pages: children are
    * descended only when their key interval can intersect the range
    * (descent margins are INCLUSIVE regardless of bound openness —
    * duplicate leading keys can span children, and one extra edge
    * subtree is cheaper than a wrong skip); entry membership is exact.
    */
  def rangeRowids(path: String, h: Header, idx: IndexDef,
                  range: KeyRange): (Seq[Long], Int) = {
    (range.lo.toSeq ++ range.hi.toSeq)
      .foreach(v => checkProbe(path, h, idx, v))
    require(range.lo.nonEmpty || range.hi.nonEmpty,
      "unbounded range probe: scan the table instead")
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

    // Closed-margin descent tests. A child between boundary records
    // prev and cur may contain leading keys anywhere in
    // [prevHead, curHead] INCLUSIVE (duplicate heads span children —
    // the full index key is (head..., rowid), so comparing heads only
    // makes both edges closed). Descend iff that closed interval
    // intersects the CLOSED hull [lo, hi] — at most one extra edge
    // subtree versus exact openness, never a wrong skip. NULL heads
    // rank below everything in cmpKey, so they fall out naturally.
    def headBelowLo(key: Any): Boolean =
      range.lo.exists(l => cmpKey(key, l) < 0)
    def headAboveHi(key: Any): Boolean =
      range.hi.exists(h => cmpKey(key, h) > 0)

    def visit(pageNo: Int): Unit = {
      val pg = pf.page(pageNo)
      val off = if (pageNo == 1) 100 else 0
      val tpe = pg(off) & 0xff
      val k = be(pg, off + 3, 2).toInt
      tpe match {
        case 0x0a => // leaf index: sorted cells, early stop above hi
          var i = 0
          var stop = false
          while (i < k && !stop) {
            val c = be(pg, off + 8 + 2 * i, 2).toInt
            val (p, n1) = varint(pg, c)
            val rec = record(payload(pf, pg, c, p, c + n1, index = true), cs)
            if (range.contains(rec.head)) out += rowidOf(rec)
            if (headAboveHi(rec.head)) stop = true
            i += 1
          }
        case 0x02 => // interior index: records AND children
          var prevAboveHi = false // -inf before cell 0 is never above
          var i = 0
          while (i < k && !prevAboveHi) {
            val c = be(pg, off + 12 + 2 * i, 2).toInt
            val child = be(pg, c, 4).toInt
            val (p, n1) = varint(pg, c + 4)
            val rec = record(payload(pf, pg, c, p, c + 4 + n1, index = true), cs)
            val key = rec.head
            if (!headBelowLo(key)) visit(child) // child max >= lo hull
            if (range.contains(key)) out += rowidOf(rec)
            prevAboveHi = headAboveHi(key)
            i += 1
          }
          // rightmost child covers (lastKey, +inf)
          if (!prevAboveHi) visit(be(pg, off + 8, 4).toInt)
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
