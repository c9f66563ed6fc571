package graft.state

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.streaming.state._
import org.apache.spark.sql.types.StructType

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** PSL-analog remote-KV state backend — the fork's actual delta.
  *
  * Reference: flink-statebackend-psl — PslStateBackend.java:40 ("Minimal PSL
  * StateBackend scaffold"), PslKeyedStateBackend.java:50 (keyed state routed
  * to an external consensus-replicated KV service via KVSClient.java:40;
  * snapshotting unsupported at lines 93-110), ByteKv.java:13-64 (byte[]
  * adapter; delete is a tombstone write, line 50).
  *
  * Spark analog: a StateStoreProvider whose store operations delegate to a
  * pluggable byte-oriented KV client. `put` maps to a linearizable write and
  * `get` to a (linearizable) read, mirroring KVSClient.put/get semantics.
  * Like the reference prototype, this is scoped: single values per key
  * (no putList/merge), no prefix scan, and version history is retained in
  * the KV itself (the durable store IS the checkpoint — the reason the
  * reference could leave snapshotting unimplemented).
  */
trait ByteKv {
  def get(key: Array[Byte]): Option[Array[Byte]]
  def put(key: Array[Byte], value: Array[Byte]): Unit
  /** Tombstone-write delete, like ByteKv.java:50. */
  def delete(key: Array[Byte]): Unit
  def scan(prefix: Array[Byte]): Iterator[(Array[Byte], Array[Byte])]
}

/** In-process stand-in for the remote consensus KV service. Keyed by a
  * namespace so many stores (operator/partition) share one "service".
  *
  * Values are stored with a 1-byte liveness marker (1=value, 0=tombstone) so
  * zero-length values are legal payloads — callers never see the marker.
  * Per-namespace write counters let tests assert commit write complexity.
  */
object InMemoryKvService {
  private val spaces = new ConcurrentHashMap[String, TrieMap[Vector[Byte], Array[Byte]]]()
  private val writeCounters = new ConcurrentHashMap[String, AtomicLong]()

  private val Live: Byte = 1
  private val Dead: Byte = 0

  def namespace(name: String): ByteKv = new ByteKv {
    private val m = spaces.computeIfAbsent(name, _ => TrieMap.empty)
    private val writes = writeCounters.computeIfAbsent(name, _ => new AtomicLong)
    override def get(key: Array[Byte]): Option[Array[Byte]] =
      m.get(key.toVector).collect { case v if v(0) == Live => v.drop(1) }
    override def put(key: Array[Byte], value: Array[Byte]): Unit = {
      writes.incrementAndGet()
      m.put(key.toVector, Live +: value)
    }
    override def delete(key: Array[Byte]): Unit = {
      writes.incrementAndGet()
      // API semantics mirror ByteKv.java:50's tombstone write; the
      // in-memory stand-in reclaims the cell physically (a real
      // consensus log compacts tombstones too) — without this, pruned
      // layer cells accumulate forever and a long-running stream OOMs
      m.remove(key.toVector)
    }
    override def scan(prefix: Array[Byte]): Iterator[(Array[Byte], Array[Byte])] = {
      val p = prefix.toVector
      m.iterator.filter { case (k, v) => k.startsWith(p) && v(0) == Live }
        .map { case (k, v) => (k.toArray, v.drop(1)) }
    }
  }

  def clearAll(): Unit = { spaces.clear(); writeCounters.clear() }
  def size(name: String): Int =
    Option(spaces.get(name)).map(_.count(_._2(0) == Live)).getOrElse(0)
  def namespaces: Seq[String] = spaces.keySet().asScala.toSeq
  /** Total put+delete RPCs issued against this namespace since clearAll. */
  def writeCount(name: String): Long =
    Option(writeCounters.get(name)).map(_.get).getOrElse(0L)
  def totalWrites: Long = writeCounters.values().asScala.map(_.get).sum
}

/** StateStoreProvider routing Structured Streaming keyed state to a ByteKv.
  * Enable with:
  * spark.sql.streaming.stateStore.providerClass=graft.state.KvStateStoreProvider
  *
  * Versioning (LSM-style layers — round-2 hardening over the full-rewrite
  * prototype): each committed version v is a LAYER under prefix "v<v>/",
  * either FULL (all live rows) or DELTA (only the keys dirtied by that
  * micro-batch; a removed key is an explicit 1-byte delete cell). Commit
  * cost is therefore O(dirty keys) per micro-batch, not O(state). Loading
  * version v merges the newest full layer f <= v with the deltas f+1..v; in
  * steady state the provider serves the merged map from its in-process
  * cache, so the KV is only scanned on restart/failover. A full layer is
  * written every `CompactEvery` commits and prunes all layers below the
  * PREVIOUS full layer, bounding retained history to <= 2*CompactEvery
  * versions (reloadable window — ample for Structured Streaming's
  * last-couple-of-versions retry contract). The KV remains the single
  * source of truth for every retained version — the PSL design premise of
  * no separate snapshot files.
  */
class KvStateStoreProvider extends StateStoreProvider {
  import KvStateStoreProvider._

  @volatile private var storeId: StateStoreId = _
  @volatile private var keySchema: StructType = _
  @volatile private var valueSchema: StructType = _
  private var kv: ByteKv = _
  // steady-state cache: (version, merged map) published as ONE volatile
  // reference — separate fields allowed a retried task's commit to swap
  // the map between another thread's version check and its copy,
  // silently handing it a FUTURE version's state
  @volatile private var cached: (Long, java.util.HashMap[Vector[Byte], Array[Byte]]) =
    (-1L, null)

  override def init(
      stateStoreId: StateStoreId,
      keySchema: StructType,
      valueSchema: StructType,
      keyStateEncoderSpec: KeyStateEncoderSpec,
      useColumnFamilies: Boolean,
      storeConfs: StateStoreConf,
      hadoopConf: Configuration,
      useMultipleValuesPerKey: Boolean,
      stateSchemaProvider: Option[StateSchemaProvider]): Unit = {
    require(!useColumnFamilies, "KvStateStoreProvider: column families unsupported (prototype scope)")
    require(!useMultipleValuesPerKey, "KvStateStoreProvider: multi-value keys unsupported")
    this.storeId = stateStoreId
    this.keySchema = keySchema
    this.valueSchema = valueSchema
    // normalize the root to a bare path: the streaming runtime and the
    // offline `statestore` reader spell the same checkpoint differently
    // (file:/x vs /x), and the namespace IS the store identity
    val root = new org.apache.hadoop.fs.Path(
      stateStoreId.checkpointRootLocation).toUri.getPath
    this.kv = InMemoryKvService.namespace(
      s"$root/${stateStoreId.operatorId}/" +
        s"${stateStoreId.partitionId}/${stateStoreId.storeName}")
    // keep the checkpoint layout ENUMERABLE: offline state tooling (the
    // `statestore` batch source) discovers partitions by listing
    // state/<op>/<partition>/ directories — rows live in the KV, but the
    // empty marker directory must exist on the checkpoint filesystem
    scala.util.Try {
      val dir = new org.apache.hadoop.fs.Path(
        stateStoreId.storeCheckpointLocation(), "_kv")
      dir.getFileSystem(hadoopConf).mkdirs(dir.getParent)
    }
  }

  override def stateStoreId: StateStoreId = storeId
  override def close(): Unit = ()

  override def getStore(version: Long, uniqueId: Option[String]): StateStore =
    new KvStore(version)

  private def layerPrefix(v: Long): Array[Byte] = s"v$v/".getBytes
  private def metaKey(v: Long): Array[Byte] = s"meta/$v".getBytes

  /** Layer kind of committed version v: Some('F') full, Some('D') delta. */
  private def layerKind(v: Long): Option[Char] =
    kv.get(metaKey(v)).map(_(0).toChar)

  /** Reconstruct the merged state at `version` from KV layers. FAILS
    * FAST (like HDFSBackedStateStoreProvider's missing-delta error) when
    * the version is not reconstructible — pruned below the retained
    * window, or never committed; silently returning an empty map would
    * resume a query over empty aggregation state and produce wrong
    * results with no error. */
  private def loadMerged(version: Long): java.util.HashMap[Vector[Byte], Array[Byte]] = {
    val m = new java.util.HashMap[Vector[Byte], Array[Byte]]()
    if (version <= 0) return m
    var base = version
    while (base > 0 && !layerKind(base).contains('F')) base -= 1
    if (base < 1)
      throw new IllegalStateException(
        s"KvStateStoreProvider: version $version of $storeId is not " +
          "reconstructible — no full layer at or below it (pruned beyond " +
          "the retained window, or never committed)")
    (base to version).foreach { v =>
      if (layerKind(v).isEmpty)
        throw new IllegalStateException(
          s"KvStateStoreProvider: layer $v needed for version $version " +
            s"of $storeId is missing")
      kv.scan(layerPrefix(v)).foreach { case (k, cell) =>
        val logical = k.drop(layerPrefix(v).length).toVector
        if (cell(0) == CellLive) m.put(logical, cell.drop(1))
        else m.remove(logical)
      }
    }
    m
  }

  /** One version's view: starts from the committed state of `loadVersion`,
    * stages changes and tracks dirty keys; commit publishes version+1 as a
    * delta (or periodic full) layer. */
  private class KvStore(val loadVersion: Long) extends StateStore {
    private val data: java.util.HashMap[Vector[Byte], Array[Byte]] = {
      val c = cached // one volatile read: version and map move together
      if (loadVersion == c._1 && c._2 != null) new java.util.HashMap(c._2)
      else loadMerged(loadVersion)
    }
    private val dirty = new java.util.HashSet[Vector[Byte]]()
    private var committed = false

    private def rowToBytes(r: UnsafeRow): Array[Byte] = r.getBytes
    private def bytesToRow(b: Array[Byte], fields: Int): UnsafeRow = {
      val r = new UnsafeRow(fields)
      r.pointTo(b, b.length)
      r
    }

    override def id: StateStoreId = storeId
    override def version: Long = loadVersion

    override def get(key: UnsafeRow, colFamilyName: String): UnsafeRow = {
      val b = data.get(rowToBytes(key).toVector)
      if (b == null) null else bytesToRow(b, valueSchema.length)
    }

    override def put(key: UnsafeRow, value: UnsafeRow, colFamilyName: String): Unit = {
      val k = rowToBytes(key).toVector
      data.put(k, rowToBytes(value))
      dirty.add(k)
    }

    override def remove(key: UnsafeRow, colFamilyName: String): Unit = {
      val k = rowToBytes(key).toVector
      if (data.remove(k) != null) dirty.add(k)
    }

    override def iterator(colFamilyName: String): StateStoreIterator[UnsafeRowPair] = {
      // SNAPSHOT the entries: the StateStore contract allows mutation
      // during iteration (WatermarkSupport.removeKeysOlderThanWatermark
      // calls remove() mid-iteration on every watermarked operator), and
      // java.util.HashMap's live iterator is fail-fast
      val snap = new java.util.ArrayList[(Vector[Byte], Array[Byte])](data.size())
      data.entrySet().iterator().asScala
        .foreach(e => snap.add((e.getKey, e.getValue)))
      val it = snap.iterator().asScala.map { case (k, v) =>
        new UnsafeRowPair(
          bytesToRow(k.toArray, keySchema.length),
          bytesToRow(v, valueSchema.length))
      }
      new StateStoreIterator(it)
    }

    override def valuesIterator(key: UnsafeRow, colFamilyName: String): Iterator[UnsafeRow] =
      Option(get(key, colFamilyName)).iterator

    override def prefixScan(prefixKey: UnsafeRow, colFamilyName: String): StateStoreIterator[UnsafeRowPair] =
      throw new UnsupportedOperationException(
        "KvStateStoreProvider: prefix scan unsupported (prototype scope, cf. PslKeyedStateBackend)")

    override def merge(key: UnsafeRow, value: UnsafeRow, colFamilyName: String): Unit =
      throw new UnsupportedOperationException("KvStateStoreProvider: merge unsupported")
    override def putList(key: UnsafeRow, values: Array[UnsafeRow], colFamilyName: String): Unit =
      throw new UnsupportedOperationException("KvStateStoreProvider: list state unsupported")
    override def mergeList(key: UnsafeRow, values: Array[UnsafeRow], colFamilyName: String): Unit =
      throw new UnsupportedOperationException("KvStateStoreProvider: list state unsupported")
    override def removeColFamilyIfExists(colFamilyName: String): Boolean =
      throw new UnsupportedOperationException("KvStateStoreProvider: column families unsupported")
    override def createColFamilyIfAbsent(
        colFamilyName: String, keySchema: StructType, valueSchema: StructType,
        keyStateEncoderSpec: KeyStateEncoderSpec, useMultipleValuesPerKey: Boolean,
        isInternal: Boolean): Unit =
      if (colFamilyName != StateStore.DEFAULT_COL_FAMILY_NAME)
        throw new UnsupportedOperationException("KvStateStoreProvider: column families unsupported")

    override def commit(): Long = {
      val next = loadVersion + 1
      // Idempotent re-commit (retried/zombie tasks): sweep any cells a
      // prior attempt left under v<next>/ so the layer reflects exactly
      // THIS attempt's writes — otherwise loadMerged would merge a failed
      // attempt's partial (or different) dirty set into every future
      // version, silently resurrecting stale state. A clean first commit
      // scans an empty prefix: zero extra writes.
      kv.scan(layerPrefix(next)).foreach { case (k, _) => kv.delete(k) }
      if (layerKind(next).isDefined) kv.delete(metaKey(next))
      // full layer on the first commit (no base yet) and every CompactEvery
      // commits thereafter; delta layer (dirty keys only) in between.
      val writeFull = next == 1 || next % CompactEvery == 0
      if (writeFull) {
        data.entrySet().iterator().asScala.foreach { e =>
          kv.put(layerPrefix(next) ++ e.getKey, CellLive +: e.getValue)
        }
        kv.put(metaKey(next), Array('F'.toByte))
        pruneBelowPreviousFull(next)
      } else {
        dirty.iterator().asScala.foreach { k =>
          val v = data.get(k)
          val cell = if (v != null) CellLive +: v else Array(CellDead)
          kv.put(layerPrefix(next) ++ k, cell)
        }
        kv.put(metaKey(next), Array('D'.toByte))
      }
      cached = (next, new java.util.HashMap(data)) // atomic publish
      committed = true
      next
    }

    /** Physically remove all layers below the previous full layer — they are
      * no longer reachable from any loadable version. */
    private def pruneBelowPreviousFull(justWrote: Long): Unit = {
      val prevFull = (justWrote - 1 to 1L by -1).find(v => layerKind(v).contains('F'))
      prevFull.foreach { pf =>
        (1L until pf).foreach { v =>
          if (layerKind(v).isDefined) {
            kv.scan(layerPrefix(v)).foreach { case (k, _) => kv.delete(k) }
            kv.delete(metaKey(v))
          }
        }
      }
    }

    override def abort(): Unit = { data.clear(); dirty.clear() }
    override def release(): Unit = ()
    override def hasCommitted: Boolean = committed

    override def metrics: StateStoreMetrics =
      StateStoreMetrics(data.size().toLong,
        data.values().asScala.map(_.length.toLong).sum, Map.empty)

    override def getStateStoreCheckpointInfo(): StateStoreCheckpointInfo =
      StateStoreCheckpointInfo(storeId.partitionId, loadVersion + 1, None, None)
  }
}

object KvStateStoreProvider {
  /** Full-layer cadence: bounds retained layer count to <= 2*CompactEvery. */
  val CompactEvery: Long = 8L
  // provider-level cell encoding inside layer values (distinct from the KV
  // service's own liveness marker): live row vs delete-in-delta marker.
  private[state] val CellLive: Byte = 1
  private[state] val CellDead: Byte = 0
}
