package graft.jdbc

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{SQLException, SQLFeatureNotSupportedException}
import java.time.{LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatterBuilder
import java.time.temporal.ChronoField
import java.util.Properties

import scala.collection.mutable.ArrayBuffer

/** A minimal, dependency-free PostgreSQL WIRE client with just enough
  * of a JDBC face for Spark's JDBC source — the JVM mirror of the
  * reference's own architecture: flaco does not link libpq either, it
  * speaks the v3 wire protocol through the native `rust-postgres`
  * client (`/root/reference/src/lib.rs:46` `Client::connect`, row
  * stream at `lib.rs:191-194`). This sandbox has a real PostgreSQL 15
  * server but no pgjdbc jar (offline resolver), so without this class
  * the live-PG parity gate ([[graft.jdbc]] test `PagilaLiveSpec`) can
  * never actually run; with it, `jdbc:postgresql://` URLs resolve
  * through `java.sql.DriverManager` (registered via
  * `META-INF/services/java.sql.Driver`) and Spark's whole JDBC read /
  * write path — [[graft.Flaco.readSqlToDataFrame]], the
  * [[graft.types.FlacoPostgresDialect]] name-first type arms,
  * `df.write.jdbc` — runs against a live server.
  *
  * Deliberately minimal, like the reference's client usage:
  *  - v3 SIMPLE QUERY protocol only (`Q` messages, TEXT results) —
  *    exactly the surface `client.query_raw` exercises;
  *  - trust / cleartext-password auth (the provisioned test cluster
  *    uses trust; no SCRAM);
  *  - `PreparedStatement` parameters are bound client-side as SQL
  *    literals (standard_conforming_strings escaping; bytea as
  *    `'\x…'::bytea`, timestamps as quoted ISO text) — batches are
  *    sent as one multi-statement simple query per JDBC batch;
  *  - results decode from the wire TEXT format by type OID — the same
  *    per-type dispatch the reference's 19-arm switch performs
  *    (`lib.rs:199-386`), here to JDBC getter values;
  *  - the giant JDBC interfaces are served through reflective
  *    [[java.lang.reflect.Proxy]] handlers that implement the ~40
  *    methods Spark's `JdbcUtils`/`JDBCRDD` actually call and throw a
  *    named [[SQLFeatureNotSupportedException]] for the rest (the
  *    catchable-error contract, `lib.rs:382-385`).
  *
  * NOT a general-purpose driver: no extended protocol, no binary
  * format, no cursors, no cancellation, no SSL — and each statement's
  * result is fully buffered in client memory before the ResultSet is
  * handed back (no fetchSize streaming), which bounds it to
  * test-harness scales by construction (PgIngestProbe measures the
  * cost honestly at 600k rows). It exists so the
  * reference's integration surface (live PG round-trips) is
  * executable in-sandbox; production deployments would put the real
  * pgjdbc on the classpath and never load this class (DriverManager
  * prefers whichever driver accepts the URL first, and pgjdbc
  * registers ahead of service-loaded fallbacks in practice — this
  * driver also steps aside if pgjdbc is present, see
  * [[MiniPgDriver.pgjdbcPresent]]).
  */
object MiniPgWire {

  /** One column of a RowDescription: name, type OID, type modifier. */
  final case class Col(name: String, oid: Int, typmod: Int)

  /** One result of a simple query: columns (empty for command-only
    * statements), rows of nullable text cells, and the command tag.
    */
  final case class Result(cols: Array[Col],
      rows: ArrayBuffer[Array[String]], tag: String)

  /** OID → pgjdbc-style type name (what
    * `ResultSetMetaData.getColumnTypeName` reports — the name-first
    * dialect arms key on these exact strings).
    */
  val TypeName: Map[Int, String] = Map(
    16 -> "bool", 17 -> "bytea", 18 -> "char", 20 -> "int8",
    21 -> "int2", 23 -> "int4", 25 -> "text", 114 -> "json",
    700 -> "float4", 701 -> "float8", 1042 -> "bpchar",
    1043 -> "varchar", 1082 -> "date", 1083 -> "time",
    1114 -> "timestamp", 1184 -> "timestamptz", 1186 -> "interval",
    1266 -> "timetz", 1700 -> "numeric", 2950 -> "uuid",
    3802 -> "jsonb")

  /** OID → java.sql.Types code (pgjdbc's choices for the same OIDs —
    * NUMERIC for numeric, TIMESTAMP for BOTH timestamp flavors, which
    * is exactly why FlacoPostgresDialect matches timestamptz by NAME).
    */
  val JdbcType: Map[Int, Int] = Map(
    16 -> java.sql.Types.BIT, 17 -> java.sql.Types.BINARY,
    18 -> java.sql.Types.CHAR, 20 -> java.sql.Types.BIGINT,
    21 -> java.sql.Types.SMALLINT, 23 -> java.sql.Types.INTEGER,
    25 -> java.sql.Types.VARCHAR, 114 -> java.sql.Types.OTHER,
    700 -> java.sql.Types.REAL, 701 -> java.sql.Types.DOUBLE,
    1042 -> java.sql.Types.CHAR, 1043 -> java.sql.Types.VARCHAR,
    1082 -> java.sql.Types.DATE, 1083 -> java.sql.Types.TIME,
    1114 -> java.sql.Types.TIMESTAMP, 1184 -> java.sql.Types.TIMESTAMP,
    1186 -> java.sql.Types.OTHER, 1266 -> java.sql.Types.TIME,
    1700 -> java.sql.Types.NUMERIC, 2950 -> java.sql.Types.OTHER,
    3802 -> java.sql.Types.OTHER)

  /** PG renders timestamps with a space separator, optional fraction,
    * and (timestamptz only) a +HH[:MM] offset; fraction digits are
    * variable. One lenient formatter covers all three render shapes.
    */
  private val TsFmt = new DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .optionalStart().appendFraction(ChronoField.MICRO_OF_SECOND, 0, 6, true).optionalEnd()
    .optionalStart().appendOffset("+HH:mm", "+00").optionalEnd()
    .toFormatter

  def parseTimestamptz(s: String): java.sql.Timestamp = {
    val t = java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME
    val norm = s.replace(' ', 'T') + (if (s.contains("+") || s.drop(11).contains("-")) "" else "Z")
    // Normalize bare '+00' / '+05' offsets to '+00:00' for ISO parse.
    val fixed = norm.replaceAll("([+-]\\d{2})$", "$1:00")
    java.sql.Timestamp.from(OffsetDateTime.parse(fixed, t).toInstant)
  }

  def parseTimestampNtz(s: String): LocalDateTime =
    LocalDateTime.parse(s, TsFmt)

  def parseByteaHex(s: String): Array[Byte] = {
    require(s.startsWith("\\x"), s"unexpected bytea literal: $s")
    val h = s.substring(2)
    val out = new Array[Byte](h.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  def renderBytea(b: Array[Byte]): String =
    "'\\x" + b.map("%02x".format(_)).mkString + "'::bytea"

  /** SQL string literal under standard_conforming_strings. */
  def quote(s: String): String = "'" + s.replace("'", "''") + "'"
}

/** One live wire session (socket + startup + simple queries). */
final class MiniPgWire(host: String, port: Int, database: String,
    user: String, password: Option[String]) {
  import MiniPgWire._

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream, 1 << 16))
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream, 1 << 16))
  @volatile private var open = true

  startup()

  private def send(tpe: Byte, body: Array[Byte]): Unit = {
    if (tpe != 0) out.writeByte(tpe.toInt)
    out.writeInt(body.length + 4)
    out.write(body)
    out.flush()
  }

  private def cstr(s: String): Array[Byte] = s.getBytes(UTF_8) :+ 0.toByte

  private def startup(): Unit = {
    // StartupMessage: protocol 3.0 + (user, database) params.
    val params = cstr("user") ++ cstr(user) ++ cstr("database") ++
      cstr(database) ++ Array(0.toByte)
    val body = new ArrayBuffer[Byte]()
    body ++= Array[Byte](0, 3, 0, 0) // 196608
    body ++= params
    send(0, body.toArray)
    var ready = false
    while (!ready) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'R' =>
          val code = ((payload(0) & 0xff) << 24) | ((payload(1) & 0xff) << 16) |
            ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
          code match {
            case 0 => () // AuthenticationOk (trust)
            case 3 => // cleartext password
              send('p'.toByte, cstr(password.getOrElse("")))
            case other =>
              throw new SQLException(
                s"unsupported auth method $other (provision the test " +
                  "cluster with trust or password auth)")
          }
        case 'S' | 'K' | 'N' => () // ParameterStatus / BackendKeyData / Notice
        case 'Z' => ready = true
        case 'E' => throw errorFrom(payload)
        case other =>
          throw new SQLException(s"unexpected startup message '${other.toChar}'")
      }
    }
  }

  private def readMessage(): (Char, Array[Byte]) = {
    val tpe = in.readByte().toChar
    val len = in.readInt() - 4
    val payload = new Array[Byte](len)
    in.readFully(payload)
    (tpe, payload)
  }

  private def errorFrom(payload: Array[Byte]): SQLException = {
    // ErrorResponse: sequence of (code byte, cstring) fields.
    var i = 0
    var msg = "error"
    var state = "XX000"
    while (i < payload.length && payload(i) != 0) {
      val code = payload(i).toChar
      val end = payload.indexOf(0.toByte, i + 1)
      val v = new String(payload, i + 1, end - i - 1, UTF_8)
      if (code == 'M') msg = v
      if (code == 'C') state = v
      i = end + 1
    }
    new SQLException(msg, state)
  }

  /** Run one simple query (may contain multiple ';'-separated
    * statements); collect all result sets / command tags.
    */
  def query(sql: String): Seq[Result] = synchronized {
    if (!open) throw new SQLException("connection is closed")
    send('Q'.toByte, cstr(sql))
    val results = ArrayBuffer.empty[Result]
    var cols: Array[Col] = Array.empty
    var rows = ArrayBuffer.empty[Array[String]]
    var err: SQLException = null
    var done = false
    while (!done) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'T' =>
          val n = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
          val cs = new Array[Col](n)
          var off = 2
          var c = 0
          while (c < n) {
            val end = payload.indexOf(0.toByte, off)
            val name = new String(payload, off, end - off, UTF_8)
            off = end + 1
            def i32(o: Int) = ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
              ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
            val oid = i32(off + 6)
            val typmod = i32(off + 12)
            off += 18
            cs(c) = Col(name, oid, typmod)
            c += 1
          }
          cols = cs
          rows = ArrayBuffer.empty
        case 'D' =>
          val n = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
          val row = new Array[String](n)
          var off = 2
          var c = 0
          while (c < n) {
            val len = ((payload(off) & 0xff) << 24) | ((payload(off + 1) & 0xff) << 16) |
              ((payload(off + 2) & 0xff) << 8) | (payload(off + 3) & 0xff)
            off += 4
            if (len == -1) row(c) = null
            else { row(c) = new String(payload, off, len, UTF_8); off += len }
            c += 1
          }
          rows += row
        case 'C' =>
          val tag = new String(payload, 0, payload.length - 1, UTF_8)
          results += Result(cols, rows, tag)
          cols = Array.empty
          rows = ArrayBuffer.empty
        case 'I' => results += Result(Array.empty, ArrayBuffer.empty, "EMPTY")
        case 'E' => err = errorFrom(payload) // drain until ReadyForQuery
        case 'N' | 'S' => ()
        case 'Z' => done = true
        case other =>
          throw new SQLException(s"unexpected message '${other.toChar}'")
      }
    }
    if (err != null) throw err
    results.toSeq
  }

  def close(): Unit = synchronized {
    if (open) {
      open = false
      try { send('X'.toByte, Array.empty) } catch { case _: Exception => () }
      try socket.close() catch { case _: Exception => () }
    }
  }

  def isOpen: Boolean = open
}

/** Reflective JDBC faces over [[MiniPgWire]]. Each java.sql interface
  * is served by a [[Proxy]] whose handler implements the methods
  * Spark's JDBC source calls; anything else throws a NAMED
  * [[SQLFeatureNotSupportedException]] so a widened calling surface
  * fails loudly instead of silently misbehaving.
  */
object MiniPgJdbc {
  import MiniPgWire._

  private def unsupported(m: Method): Nothing =
    throw new SQLFeatureNotSupportedException(
      s"MiniPgDriver does not implement ${m.getDeclaringClass.getSimpleName}.${m.getName}")

  private def proxy[T](iface: Class[T])(
      pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          val key = (m.getName, a)
          m.getName match {
            case "toString" if !pf.isDefinedAt(key) => s"MiniPg(${iface.getSimpleName})"
            case "hashCode" if !pf.isDefinedAt(key) => Integer.valueOf(System.identityHashCode(p))
            case "equals" if !pf.isDefinedAt(key) => java.lang.Boolean.valueOf(p eq a(0))
            case _ => if (pf.isDefinedAt(key)) pf(key) else unsupported(m)
          }
        }
      }).asInstanceOf[T]

  private val B = java.lang.Boolean.valueOf(_: Boolean)
  private val I = Integer.valueOf(_: Int)

  // ---- result set ----

  def resultSet(res: MiniPgWire.Result): java.sql.ResultSet = {
    var cursor = -1
    var nullFlag = false
    var closed = false
    def cell(i: Int): String = {
      val v = res.rows(cursor)(i - 1)
      nullFlag = v == null
      v
    }
    def col(i: Int): MiniPgWire.Col = res.cols(i - 1)
    lazy val meta: java.sql.ResultSetMetaData =
      proxy(classOf[java.sql.ResultSetMetaData]) {
        case ("getColumnCount", _) => I(res.cols.length)
        case ("getColumnLabel", a) => col(a(0).asInstanceOf[Integer]).name
        case ("getColumnName", a) => col(a(0).asInstanceOf[Integer]).name
        case ("getColumnType", a) =>
          I(JdbcType.getOrElse(col(a(0).asInstanceOf[Integer]).oid,
            java.sql.Types.OTHER))
        case ("getColumnTypeName", a) =>
          TypeName.getOrElse(col(a(0).asInstanceOf[Integer]).oid, "unknown")
        case ("getPrecision", a) =>
          val c = col(a(0).asInstanceOf[Integer])
          I(if (c.oid == 1700 && c.typmod >= 4) (c.typmod - 4) >> 16
            else if ((c.oid == 1042 || c.oid == 1043) && c.typmod >= 4) c.typmod - 4
            else 0)
        case ("getScale", a) =>
          val c = col(a(0).asInstanceOf[Integer])
          I(if (c.oid == 1700 && c.typmod >= 4) (c.typmod - 4) & 0xffff else 0)
        case ("isNullable", a) => I(java.sql.ResultSetMetaData.columnNullableUnknown)
        case ("isSigned", a) =>
          B(Set(20, 21, 23, 700, 701, 1700).contains(col(a(0).asInstanceOf[Integer]).oid))
        case ("getColumnDisplaySize", _) => I(0)
        case ("isCaseSensitive", _) => B(true)
        case ("isCurrency", _) => B(false)
        case ("isAutoIncrement", _) => B(false)
        case ("getCatalogName", _) => ""
        case ("getSchemaName", _) => ""
        case ("getTableName", _) => ""
      }
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) =>
        cursor += 1
        B(cursor < res.rows.length)
      case ("close", _) => closed = true; null
      case ("isClosed", _) => B(closed)
      case ("wasNull", _) => B(nullFlag)
      case ("getMetaData", _) => meta
      case ("getString", a) => cell(a(0).asInstanceOf[Integer])
      case ("getInt", a) =>
        val v = cell(a(0).asInstanceOf[Integer]); I(if (v == null) 0 else v.toInt)
      case ("getLong", a) =>
        val v = cell(a(0).asInstanceOf[Integer])
        java.lang.Long.valueOf(if (v == null) 0L else v.toLong)
      case ("getShort", a) =>
        val v = cell(a(0).asInstanceOf[Integer])
        java.lang.Short.valueOf(if (v == null) 0.toShort else v.toShort)
      case ("getByte", a) =>
        val v = cell(a(0).asInstanceOf[Integer])
        java.lang.Byte.valueOf(if (v == null) 0.toByte else v.toByte)
      case ("getDouble", a) =>
        val v = cell(a(0).asInstanceOf[Integer])
        java.lang.Double.valueOf(if (v == null) 0.0 else v.toDouble)
      case ("getFloat", a) =>
        val v = cell(a(0).asInstanceOf[Integer])
        java.lang.Float.valueOf(if (v == null) 0.0f else v.toFloat)
      case ("getBoolean", a) =>
        val v = cell(a(0).asInstanceOf[Integer]); B(v == "t" || v == "true")
      case ("getBigDecimal", a) if a.length == 1 =>
        val v = cell(a(0).asInstanceOf[Integer])
        if (v == null) null else new java.math.BigDecimal(v)
      case ("getBytes", a) =>
        val v = cell(a(0).asInstanceOf[Integer])
        if (v == null) null else parseByteaHex(v)
      case ("getDate", a) if a.length == 1 =>
        val v = cell(a(0).asInstanceOf[Integer])
        if (v == null) null else java.sql.Date.valueOf(LocalDate.parse(v))
      case ("getTimestamp", a) if a.length == 1 =>
        val v = cell(a(0).asInstanceOf[Integer])
        if (v == null) null
        else {
          val c = col(a(0).asInstanceOf[Integer])
          c.oid match {
            case 1184 => parseTimestamptz(v)
            // time / timetz: pgjdbc's convention — a timestamp on the
            // epoch date (PgTypeMap.timeAsMicros then re-derives
            // µs-since-midnight from it, base date irrelevant).
            case 1083 =>
              java.sql.Timestamp.valueOf(parseTimestampNtz(s"1970-01-01 $v"))
            case 1266 => parseTimestamptz(s"1970-01-01 $v")
            case _ => java.sql.Timestamp.valueOf(parseTimestampNtz(v))
          }
        }
      case ("getObject", a) if a.length == 2 &&
          a(1) == classOf[LocalDateTime] =>
        val v = cell(a(0).asInstanceOf[Integer])
        if (v == null) null else parseTimestampNtz(v)
      case ("getObject", a) if a.length == 2 && a(1) == classOf[LocalDate] =>
        val v = cell(a(0).asInstanceOf[Integer])
        if (v == null) null else LocalDate.parse(v)
      case ("getTime", a) if a.length == 1 =>
        // Spark's TIME getter. java.sql.Time is millis-precision; the
        // value is the UTC instant of 1970-01-01T<time> (timetz
        // offsets applied), which Spark then reads as an instant.
        val v = cell(a(0).asInstanceOf[Integer])
        if (v == null) null
        else {
          val c = col(a(0).asInstanceOf[Integer])
          val ts = if (c.oid == 1266) parseTimestamptz(s"1970-01-01 $v")
            else java.sql.Timestamp.valueOf(parseTimestampNtz(s"1970-01-01 $v"))
          new java.sql.Time(ts.getTime)
        }
      case ("setFetchSize", _) => null
      case ("getFetchSize", _) => I(0)
      case ("getWarnings", _) => null
      case ("clearWarnings", _) => null
      case ("getHoldability", _) => I(java.sql.ResultSet.CLOSE_CURSORS_AT_COMMIT)
      case ("getType", _) => I(java.sql.ResultSet.TYPE_FORWARD_ONLY)
    }
  }

  private def updateCount(tag: String): Int = {
    val parts = tag.split(' ')
    parts.lastOption.flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(0)
  }

  // ---- statements ----

  /** Split a SQL text into segments around top-level '?' parameter
    * markers (quote-aware: markers inside single-quoted literals or
    * double-quoted identifiers are text, not parameters).
    */
  def splitParams(sql: String): Array[String] = {
    val segs = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inS = false
    var inD = false
    var i = 0
    while (i < sql.length) {
      val ch = sql.charAt(i)
      if (ch == '\'' && !inD) inS = !inS
      else if (ch == '"' && !inS) inD = !inD
      if (ch == '?' && !inS && !inD) { segs += cur.toString; cur.clear() }
      else cur.append(ch)
      i += 1
    }
    segs += cur.toString
    segs.toArray
  }

  def statement(wire: MiniPgWire, conn: java.sql.Connection,
      sql: Option[String]): java.sql.PreparedStatement = {
    val segs = sql.map(splitParams).getOrElse(Array.empty)
    val params = new Array[String](math.max(0, segs.length - 1))
    val batch = ArrayBuffer.empty[String]
    var closed = false
    var lastResult: Option[MiniPgWire.Result] = None

    def render(): String = {
      require(params.forall(_ != null),
        "not all parameters bound before execute")
      val sb = new StringBuilder(segs(0))
      var i = 0
      while (i < params.length) { sb.append(params(i)); sb.append(segs(i + 1)); i += 1 }
      sb.toString
    }
    def setP(i: Int, v: String): AnyRef = { params(i - 1) = v; null }
    def tsRender(ts: java.sql.Timestamp): String = {
      // Explicit HH:mm:ss — LocalTime.toString drops ':00' seconds
      // ('00:01' for one minute), which PG then mis-parses.
      val odt = OffsetDateTime.ofInstant(ts.toInstant, ZoneOffset.UTC)
      val micros = odt.getNano / 1000
      quote(f"${odt.toLocalDate}%s ${odt.getHour}%02d:${odt.getMinute}%02d:" +
        f"${odt.getSecond}%02d.$micros%06d+00")
    }

    proxy(classOf[java.sql.PreparedStatement]) {
      case ("executeQuery", a) =>
        val q = if (a.nonEmpty) a(0).asInstanceOf[String] else render()
        val res = wire.query(q)
        val withRows = res.find(_.cols.nonEmpty).getOrElse(res.last)
        lastResult = Some(withRows)
        resultSet(withRows)
      case ("executeUpdate", a) =>
        val q = if (a.nonEmpty) a(0).asInstanceOf[String] else render()
        I(updateCount(wire.query(q).last.tag))
      case ("execute", a) =>
        val q = if (a.nonEmpty) a(0).asInstanceOf[String] else render()
        val res = wire.query(q)
        lastResult = res.find(_.cols.nonEmpty)
        B(lastResult.isDefined)
      case ("getResultSet", _) => lastResult.map(resultSet).orNull
      case ("getUpdateCount", _) => I(-1)
      case ("addBatch", a) =>
        batch += (if (a.nonEmpty) a(0).asInstanceOf[String] else render())
        null
      case ("clearBatch", _) => batch.clear(); null
      case ("executeBatch", _) =>
        if (batch.nonEmpty) { wire.query(batch.mkString(";\n")): Unit }
        val out = Array.fill(batch.length)(1)
        batch.clear()
        out
      case ("clearParameters", _) =>
        java.util.Arrays.fill(params.asInstanceOf[Array[AnyRef]], null); null
      case ("setNull", a) => setP(a(0).asInstanceOf[Integer], "NULL")
      case ("setInt", a) => setP(a(0).asInstanceOf[Integer], a(1).toString)
      case ("setLong", a) => setP(a(0).asInstanceOf[Integer], a(1).toString)
      case ("setShort", a) => setP(a(0).asInstanceOf[Integer], a(1).toString)
      case ("setByte", a) => setP(a(0).asInstanceOf[Integer], a(1).toString)
      case ("setDouble", a) => setP(a(0).asInstanceOf[Integer],
        s"'${a(1)}'::float8")
      case ("setFloat", a) => setP(a(0).asInstanceOf[Integer],
        s"'${a(1)}'::float4")
      case ("setBoolean", a) => setP(a(0).asInstanceOf[Integer], a(1).toString)
      case ("setString", a) => setP(a(0).asInstanceOf[Integer],
        quote(a(1).asInstanceOf[String]))
      case ("setBigDecimal", a) => setP(a(0).asInstanceOf[Integer],
        a(1).asInstanceOf[java.math.BigDecimal].toPlainString)
      case ("setBytes", a) => setP(a(0).asInstanceOf[Integer],
        renderBytea(a(1).asInstanceOf[Array[Byte]]))
      case ("setTimestamp", a) => setP(a(0).asInstanceOf[Integer],
        tsRender(a(1).asInstanceOf[java.sql.Timestamp]))
      case ("setDate", a) => setP(a(0).asInstanceOf[Integer],
        quote(a(1).asInstanceOf[java.sql.Date].toString) + "::date")
      case ("setObject", a) if a.length == 2 => a(1) match {
        case s: String => setP(a(0).asInstanceOf[Integer], quote(s))
        case n: java.lang.Number => setP(a(0).asInstanceOf[Integer], n.toString)
        case ldt: LocalDateTime =>
          setP(a(0).asInstanceOf[Integer], quote(ldt.toString.replace('T', ' ')))
        case other => throw new SQLFeatureNotSupportedException(
          s"setObject(${other.getClass.getName})")
      }
      case ("setQueryTimeout", _) => null
      case ("setFetchSize", _) => null
      case ("getFetchSize", _) => I(0)
      case ("setMaxRows", _) => null
      case ("cancel", _) => null
      case ("close", _) => closed = true; null
      case ("isClosed", _) => B(closed)
      case ("getConnection", _) => conn
      case ("getWarnings", _) => null
      case ("clearWarnings", _) => null
      case ("getMoreResults", _) => B(false)
      case ("getMetaData", _) => null // unknown before execution; Spark tolerates
    }
  }

  // ---- connection ----

  def connection(wire: MiniPgWire, url: String, user: String): java.sql.Connection = {
    var closed = false
    lazy val self: java.sql.Connection = proxy(classOf[java.sql.Connection]) {
      case ("prepareStatement", a) =>
        statement(wire, self, Some(a(0).asInstanceOf[String]))
      case ("createStatement", _) => statement(wire, self, None)
      case ("getMetaData", _) => dbMeta(url, user)
      case ("close", _) =>
        if (!closed) { closed = true; wire.close() }; null
      case ("isClosed", _) => B(closed || !wire.isOpen)
      case ("isValid", _) => B(!closed && wire.isOpen)
      case ("setAutoCommit", _) => null // simple protocol autocommits
      case ("getAutoCommit", _) => B(true)
      case ("commit", _) => null
      case ("rollback", _) => null
      case ("setTransactionIsolation", _) => null
      case ("getTransactionIsolation", _) =>
        I(java.sql.Connection.TRANSACTION_READ_COMMITTED)
      case ("setReadOnly", _) => null
      case ("isReadOnly", _) => B(false)
      case ("getCatalog", _) => null
      case ("setCatalog", _) => null
      case ("getSchema", _) => "public"
      case ("getWarnings", _) => null
      case ("clearWarnings", _) => null
      case ("nativeSQL", a) => a(0)
    }
    self
  }

  private def dbMeta(url: String, user: String): java.sql.DatabaseMetaData =
    proxy(classOf[java.sql.DatabaseMetaData]) {
      // No transaction surface: the simple protocol autocommits each
      // query, so Spark's savePartition skips setAutoCommit/commit
      // entirely (its documented non-transactional path).
      case ("supportsTransactions", _) => B(false)
      case ("supportsDataManipulationTransactionsOnly", _) => B(false)
      case ("supportsDataDefinitionAndDataManipulationTransactions", _) => B(false)
      case ("getDatabaseProductName", _) => "PostgreSQL"
      case ("getDatabaseProductVersion", _) => "15"
      case ("getDatabaseMajorVersion", _) => I(15)
      case ("getDatabaseMinorVersion", _) => I(0)
      case ("getDriverName", _) => "graft-minipg"
      case ("getDriverVersion", _) => "0.1"
      case ("getDriverMajorVersion", _) => I(0)
      case ("getDriverMinorVersion", _) => I(1)
      case ("getJDBCMajorVersion", _) => I(4)
      case ("getJDBCMinorVersion", _) => I(2)
      case ("getURL", _) => url
      case ("getUserName", _) => user
      case ("getIdentifierQuoteString", _) => "\""
      case ("storesMixedCaseIdentifiers", _) => B(false)
      case ("storesLowerCaseIdentifiers", _) => B(true)
      case ("storesUpperCaseIdentifiers", _) => B(false)
      case ("supportsMixedCaseIdentifiers", _) => B(false)
      case ("getSQLKeywords", _) => ""
      case ("getExtraNameCharacters", _) => ""
      case ("getMaxColumnNameLength", _) => I(63)
    }
}

/** The java.sql.Driver face. Registered with [[java.sql.DriverManager]]
  * both via `META-INF/services/java.sql.Driver` (classpath discovery)
  * and the idempotent [[MiniPgDriver.ensureRegistered]]. Steps aside
  * if a real pgjdbc is on the classpath — this driver exists for the
  * sandbox, not to shadow the real one.
  */
class MiniPgDriver extends java.sql.Driver {
  MiniPgDriver.ensureRegistered()

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:postgresql:") &&
      !MiniPgDriver.pgjdbcPresent

  override def connect(url: String, info: Properties): java.sql.Connection = {
    if (!acceptsURL(url)) return null
    val (host, port, db, params) = MiniPgDriver.parseUrl(url)
    def opt(k: String): Option[String] =
      Option(if (info == null) null else info.getProperty(k)).orElse(params.get(k))
    val user = opt("user").getOrElse("postgres")
    val wire = new MiniPgWire(host, port, db, user, opt("password"))
    MiniPgJdbc.connection(wire, url, user)
  }

  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 1
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new SQLFeatureNotSupportedException("getParentLogger")
}

object MiniPgDriver {
  lazy val pgjdbcPresent: Boolean =
    try { Class.forName("org.postgresql.Driver"); true }
    catch { case _: ClassNotFoundException => false }

  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Idempotent DriverManager registration. */
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true)) {
      java.sql.DriverManager.registerDriver(new RegisteredMiniPgDriver)
    }

  /** `jdbc:postgresql://host[:port]/db[?k=v&…]` (pgjdbc URL shape). */
  def parseUrl(url: String): (String, Int, String, Map[String, String]) = {
    val u = new java.net.URI(url.stripPrefix("jdbc:"))
    val host = Option(u.getHost).getOrElse("localhost")
    val port = if (u.getPort > 0) u.getPort else 5432
    val db = Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
      .getOrElse("postgres")
    val params = Option(u.getQuery).map(_.split('&').toSeq).getOrElse(Seq.empty)
      .flatMap { kv =>
        kv.split('=') match {
          case Array(k, v) => Some(k -> v)
          case _ => None
        }
      }.toMap
    (host, port, db, params)
  }
}

/** The instance actually held by DriverManager (avoids re-running the
  * constructor-side registration recursively).
  */
private class RegisteredMiniPgDriver extends java.sql.Driver {
  private val inner = {
    // Bypass the registering constructor path.
    val d = new MiniPgDriver
    d
  }
  override def acceptsURL(url: String): Boolean = inner.acceptsURL(url)
  override def connect(url: String, info: Properties): java.sql.Connection =
    inner.connect(url, info)
  override def getMajorVersion: Int = inner.getMajorVersion
  override def getMinorVersion: Int = inner.getMinorVersion
  override def jdbcCompliant(): Boolean = inner.jdbcCompliant()
  override def getPropertyInfo(url: String, info: Properties): Array[java.sql.DriverPropertyInfo] =
    inner.getPropertyInfo(url, info)
  override def getParentLogger: java.util.logging.Logger = inner.getParentLogger
}
