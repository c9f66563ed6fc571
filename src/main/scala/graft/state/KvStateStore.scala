package graft.state

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.streaming.state._
import org.apache.spark.sql.types.StructType

import java.util.concurrent.ConcurrentHashMap
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
  * namespace so many stores (operator/partition) share one "service". */
object InMemoryKvService {
  private val spaces = new ConcurrentHashMap[String, TrieMap[Vector[Byte], Array[Byte]]]()

  def namespace(name: String): ByteKv = new ByteKv {
    private val m = spaces.computeIfAbsent(name, _ => TrieMap.empty)
    private val Tombstone: Array[Byte] = Array[Byte]()
    override def get(key: Array[Byte]): Option[Array[Byte]] =
      m.get(key.toVector).filter(_.nonEmpty)
    override def put(key: Array[Byte], value: Array[Byte]): Unit =
      m.put(key.toVector, value)
    override def delete(key: Array[Byte]): Unit =
      m.put(key.toVector, Tombstone) // tombstone write (ByteKv.java:50)
    override def scan(prefix: Array[Byte]): Iterator[(Array[Byte], Array[Byte])] = {
      val p = prefix.toVector
      m.iterator.filter { case (k, v) => k.startsWith(p) && v.nonEmpty }
        .map { case (k, v) => (k.toArray, v) }
    }
  }

  def clearAll(): Unit = spaces.clear()
  def size(name: String): Int =
    Option(spaces.get(name)).map(_.count(_._2.nonEmpty)).getOrElse(0)
  def namespaces: Seq[String] = spaces.keySet().asScala.toSeq
}

/** StateStoreProvider routing Structured Streaming keyed state to a ByteKv.
  * Enable with:
  * spark.sql.streaming.stateStore.providerClass=graft.state.KvStateStoreProvider
  *
  * Versioning: each committed version v stores rows under prefix "v<v>/";
  * loading version v is a prefix scan — the KV is the source of truth for
  * every version, so there is no separate snapshot/changelog file (the
  * PSL design premise). A production client would batch these RPCs; the
  * in-memory service makes the semantics testable hermetically.
  */
class KvStateStoreProvider extends StateStoreProvider {
  @volatile private var storeId: StateStoreId = _
  @volatile private var keySchema: StructType = _
  @volatile private var valueSchema: StructType = _
  private var kv: ByteKv = _

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
    this.kv = InMemoryKvService.namespace(
      s"${stateStoreId.checkpointRootLocation}/${stateStoreId.operatorId}/" +
        s"${stateStoreId.partitionId}/${stateStoreId.storeName}")
  }

  override def stateStoreId: StateStoreId = storeId
  override def close(): Unit = ()

  override def getStore(version: Long, uniqueId: Option[String]): StateStore =
    new KvStore(version)

  /** One version's view: loads committed rows of `version`, stages changes,
    * commit publishes them as `version + 1`. */
  private class KvStore(val loadVersion: Long) extends StateStore {
    private val data = new java.util.HashMap[Vector[Byte], Array[Byte]]()
    private var committed = false
    locally {
      kv.scan(prefix(loadVersion)).foreach { case (k, v) =>
        data.put(k.drop(prefix(loadVersion).length).toVector, v)
      }
    }

    private def prefix(v: Long): Array[Byte] = s"v$v/".getBytes
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

    override def put(key: UnsafeRow, value: UnsafeRow, colFamilyName: String): Unit =
      data.put(rowToBytes(key).toVector, rowToBytes(value))

    override def remove(key: UnsafeRow, colFamilyName: String): Unit =
      data.remove(rowToBytes(key).toVector)

    override def iterator(colFamilyName: String): StateStoreIterator[UnsafeRowPair] = {
      val it = data.entrySet().iterator().asScala.map { e =>
        new UnsafeRowPair(
          bytesToRow(e.getKey.toArray, keySchema.length),
          bytesToRow(e.getValue, valueSchema.length))
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
      // Linearizable writes of the new version's rows (KVSClient.put:59).
      data.entrySet().iterator().asScala.foreach { e =>
        kv.put(prefix(next) ++ e.getKey, e.getValue)
      }
      // Tombstone rows that existed at loadVersion but were removed.
      kv.scan(prefix(next)).foreach { case (k, _) =>
        val logical = k.drop(prefix(next).length).toVector
        if (!data.containsKey(logical)) kv.delete(k)
      }
      committed = true
      next
    }

    override def abort(): Unit = { data.clear() }
    override def release(): Unit = ()
    override def hasCommitted: Boolean = committed

    override def metrics: StateStoreMetrics =
      StateStoreMetrics(data.size().toLong,
        data.values().asScala.map(_.length.toLong).sum, Map.empty)

    override def getStateStoreCheckpointInfo(): StateStoreCheckpointInfo =
      StateStoreCheckpointInfo(storeId.partitionId, loadVersion + 1, None, None)
  }
}
