package graft.pipeline

import java.sql.Connection

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{BinaryType, StructType}

/** Bulk-ingest API for [[JdbcSink]]'s COPY mode — the README-claimed
  * Postgres `COPY` path the reference never implemented (`READme.md:24`
  * claims it; `main.py:205` actually ships batched INSERTs via
  * `to_sql(method='multi')`).
  *
  * The seam is a tiny SAM so the Spark-side orchestration (DDL reuse,
  * per-partition connections, streaming serialization) is testable without
  * a live Postgres: production wires [[PgCopyApi]] (reflection onto the pg
  * driver's CopyManager — the driver jar is a deploy-time presence, not a
  * compile dependency); JdbcSinkSpec wires a Derby-backed stand-in that
  * consumes the SAME text stream, proving both sink modes land identical
  * table contents.
  */
trait CopyApi extends Serializable {
  /** Execute `sql` (a `COPY ... FROM STDIN` form) feeding `rows`, the
    * table data in COPY text format. Returns rows ingested.
    */
  def copyIn(conn: Connection, sql: String, rows: java.io.Reader): Long
}

/** COPY text-format serialization (PostgreSQL's default `COPY FROM STDIN`
  * wire form: tab-separated fields, newline-terminated records, `\N` for
  * NULL, backslash escapes). Kept as pure functions — the escaping rules
  * are exactly what the spec's round-trip has to pin.
  */
object PgCopyText {
  /** The column list is NOT optional: a bare `COPY t FROM STDIN` loads by
    * physical column position, so a pre-created table whose column order
    * differs from the frame's schema (the DDL-preservation scenario the
    * sink explicitly supports) would be silently misloaded — while the
    * INSERT mode targets columns by name (r10 review).
    * Names are double-quoted exactly as Spark's JDBC writer quotes them
    * when creating the table and targeting the INSERTs — both modes then
    * share one identifier-case behavior.
    */
  def copySql(table: String, columns: Seq[String]): String =
    s"""COPY $table (${columns.map(c => "\"" + c + "\"").mkString(", ")}) FROM STDIN"""

  /** One field. COPY text requires escaping ONLY backslash and the three
    * structural characters (field/record separators); everything else
    * passes through verbatim in the client encoding.
    */
  def encodeField(v: Any): String = v match {
    case null => "\\N"
    case b: Array[Byte] => // bytea hex form, itself backslash-escaped
      "\\\\x" + b.map("%02x".format(_)).mkString
    case other =>
      val s = other.toString
      if (s.indexOf('\\') < 0 && s.indexOf('\t') < 0 &&
          s.indexOf('\n') < 0 && s.indexOf('\r') < 0) s
      else {
        val sb = new StringBuilder(s.length + 8)
        s.foreach {
          case '\\' => sb.append("\\\\")
          case '\t' => sb.append("\\t")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case c => sb.append(c)
        }
        sb.toString
      }
  }

  def encodeRow(row: Row, schema: StructType): String = {
    val sb = new StringBuilder(64)
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append('\t')
      val v =
        if (row.isNullAt(i)) null
        else if (schema(i).dataType == BinaryType) row.getAs[Array[Byte]](i)
        else row.get(i)
      sb.append(encodeField(v))
      i += 1
    }
    sb.append('\n')
    sb.toString
  }

  /** Streams pre-encoded records to the COPY consumer without ever holding
    * a partition's data in one buffer — the executor-side memory contract
    * at scale.
    *
    * CONTRACT DEVIATION, deliberate: `read(cbuf, off, len)` may return 0
    * for a `len == 1` call whose only available char is a high surrogate
    * with its low half still buffered — `java.io.Reader` says a read
    * "blocks until some input is available", and 0 is outside that
    * letter. Returning the lone surrogate would let pgjdbc's
    * per-chunk encoder emit a replacement char (silent text corruption);
    * 0 defers it one lap and the next call emits the pair together.
    * Consumers must treat only -1 as EOF (pgjdbc does; the no-arg
    * `read()` below loops the deferral lap for char-at-a-time callers).
    * pgjdbc never issues `len == 1` array reads, so the branch is
    * defensive — but a new consumer that maps 0 to EOF would truncate.
    */
  final class RecordsReader(records: Iterator[String]) extends java.io.Reader {
    private var cur = ""
    private var pos = 0
    // a high surrogate backed out of a 1-char chunk, re-emitted at the
    // START of the next read so the pair still lands in one chunk for any
    // caller buffer of >= 2 (r13 ADVICE: the n > 1 backoff alone let a
    // len == 1 top-up read — e.g. a caller filling the last slot of its
    // own buffer before encoding it — end that buffer on a lone high
    // surrogate)
    private var pending: Char = 0
    override def read(cbuf: Array[Char], off: Int, len: Int): Int = {
      if (len == 0) return 0
      var written = 0
      if (pending != 0) {
        // pending implies its low half is still first in `cur`, so the
        // refill loop below cannot be needed and EOF cannot be reached here
        cbuf(off) = pending; pending = 0; written = 1
      } else {
        while (pos >= cur.length) {
          if (!records.hasNext) return -1
          cur = records.next(); pos = 0
        }
      }
      var n = math.min(len - written, cur.length - pos)
      // never END a chunk on an unpaired high surrogate when its low half
      // is still pending: pgjdbc's CopyManager.copyIn(sql, Reader) encodes
      // EACH chunk independently, so a supplementary character (emoji,
      // CJK-B) split across the buffer boundary of a >bufferSize record
      // would encode as two replacement chars — silent text corruption
      // with the row-count audit green (r13 review wave). Backing off one
      // char keeps the pair together in the next chunk. When the whole
      // chunk would BE that lone surrogate (a len == 1 caller), defer it
      // and return 0 — the one Reader-legal way to refuse the split while
      // guaranteeing progress: the next call emits it immediately, with
      // its low half whenever the buffer allows.
      if (n > 0 && Character.isHighSurrogate(cur.charAt(pos + n - 1))
        && pos + n < cur.length) {
        if (written + n > 1) n -= 1
        else { pending = cur.charAt(pos); pos += 1; return 0 }
      }
      if (n > 0) { cur.getChars(pos, pos + n, cbuf, off + written); pos += n }
      written + n
    }
    /** The inherited no-arg read() treats any non-(-1) return as "buffer
      * filled" — a 0 from the defer branch would hand the caller a
      * spurious NUL (the untouched scratch array's zero char) as
      * stream data (r14 review).
      * Loop the one deferral lap instead; the pair-splitting this path
      * implies is unavoidable for a char-at-a-time consumer, which
      * reassembles the stream itself anyway.
      */
    override def read(): Int = {
      val one = new Array[Char](1)
      var n = read(one, 0, 1)
      while (n == 0) n = read(one, 0, 1)
      if (n == -1) -1 else one(0)
    }
    override def close(): Unit = ()
  }
}

/** The production [[CopyApi]]: PostgreSQL JDBC's CopyManager, reached via
  * reflection so the pg driver stays a runtime-classpath concern (this
  * build ships none — Derby is the test database). Fails with a clear
  * message when the connection isn't a pg one.
  */
object PgCopyApi extends CopyApi {
  override def copyIn(conn: Connection, sql: String,
      rows: java.io.Reader): Long = {
    val base =
      try Class.forName("org.postgresql.core.BaseConnection")
      catch {
        case _: ClassNotFoundException => throw new IllegalStateException(
          "COPY mode needs the PostgreSQL JDBC driver on the classpath " +
            "(org.postgresql.*); use the default batched-INSERT mode otherwise")
      }
    val cm = Class.forName("org.postgresql.copy.CopyManager")
      .getConstructor(base)
      .newInstance(conn.unwrap(base).asInstanceOf[AnyRef])
    try cm.getClass
      .getMethod("copyIn", classOf[String], classOf[java.io.Reader])
      .invoke(cm, sql, rows)
      .asInstanceOf[java.lang.Long].longValue()
    catch {
      // unwrap: the actionable error is the server's SQLException, not
      // the reflection wrapper it would otherwise headline the task
      // failure with
      case e: java.lang.reflect.InvocationTargetException
          if e.getCause != null => throw e.getCause
    }
  }
}
