package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch aggregate (Cormode & Muthukrishnan 2005): `depth`
  * hash rows × `width` counters, update adds 1 to one counter per row,
  * point estimate = min over rows — an O(depth·width) summary of an
  * unbounded key stream whose estimates only ever OVERCOUNT (est ≥ true;
  * est ≤ true + εN with probability 1−δ for ε = e/width, δ = e^−depth).
  *
  * The third leg of graft's custom-aggregate surface (SURVEY.md §2.10,
  * next to [[BottomKAgg]]'s bounded top-k and the builtin HLL/GK
  * sketches): where HLL answers "how many distinct", CMS answers "how
  * often does THIS key occur" for every key at once, in constant state —
  * the frequency table you cannot afford to materialize at 100 TB.
  * Like all TypedImperativeAggregates it folds map-side and merges by
  * element-wise addition (a commutative monoid), so the shuffle carries
  * depth×width longs per partition regardless of stream size.
  *
  * Buckets are derived from the md5 hex prefix (52 bits) of
  * `"cms<row>:<key>"` — NOT from a faster hash — so the exact same
  * counter matrix is reproducible in any engine with md5 (the DuckDB
  * oracle rebuilds it with GROUP BY md5-bucket and matches estimates
  * bit-for-bit; OracleRound-style determinism, but for a sketch).
  */
case class CountMinAgg(
    key: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes {

  require(depth >= 1 && depth <= 8, "graft_cms depth must be in [1, 8]")
  require(width >= 2 && width <= (1 << 20), "graft_cms width must be in [2, 2^20]")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    if (k != null) {
      val bytes = k.asInstanceOf[UTF8String].getBytes
      var d = 0
      while (d < depth) {
        buf(d * width + CountMinAgg.bucketOfBytes(d, bytes, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(depth * width)(in.readLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key)
  override def prettyName: String = "graft_cms"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(key = newChildren(0))
}

object CountMinAgg {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(8)(d =>
      s"cms$d:".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Hash-row `d`'s bucket for `key`: the first 13 hex chars (52 bits) of
    * md5("cms<d>:<key>"), mod width. The same derivation is expressible
    * as a column expression (`conv(substring(md5(..), 1, 13), 16, 10)`)
    * and in DuckDB's hex fold — one definition, three engines.
    */
  def bucket(d: Int, key: String, width: Int): Int =
    bucketOfBytes(d,
      key.getBytes(java.nio.charset.StandardCharsets.UTF_8), width)

  /** The per-row hot path: the 52-bit value is folded STRAIGHT from the
    * digest bytes — 13 hex chars = bytes 0..5 plus the HIGH nibble of
    * byte 6, so `(b0..b5 << 4) | (b6 >>> 4)` equals
    * `parseLong(hex.take(13), 16)` exactly. The previous spelling
    * rendered the digest through a per-byte `Formatter` (`f"$b%02x"`),
    * which at depth 3 over a multi-million-term stream dominated the
    * whole aggregation (the round-13 `sql_graft_sketches` drift: ~3.5×
    * the per-row cost of the scan under it); CountMinSpec pins this fold
    * against the hex-string reference derivation (PropertySpec /
    * OperatorsSpec additionally pin the column-expression spelling).
    */
  private[functions] def bucketOfBytes(
      d: Int, keyBytes: Array[Byte], width: Int): Int = {
    val digest = md5.get()
    digest.reset()
    digest.update(prefixes(d))
    digest.update(keyBytes)
    val h = digest.digest()
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v = (v << 4) | ((h(6) & 0xf0L) >>> 4)
    (v % width).toInt
  }
}
