package flowbyte.memcat;

import java.io.IOException;
import java.io.Serializable;
import java.math.BigDecimal;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.Collections;
import java.util.HashSet;
import java.util.List;
import java.util.Map;
import java.util.Set;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.catalyst.CatalystTypeConverters;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException;
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException;
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException;
import org.apache.spark.sql.connector.catalog.Identifier;
import org.apache.spark.sql.connector.catalog.NamespaceChange;
import org.apache.spark.sql.connector.catalog.MetadataColumn;
import org.apache.spark.sql.connector.catalog.SupportsDelete;
import org.apache.spark.sql.connector.catalog.SupportsMetadataColumns;
import org.apache.spark.sql.connector.catalog.SupportsNamespaces;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableCatalog;
import org.apache.spark.sql.connector.catalog.TableChange;
import org.apache.spark.sql.connector.expressions.FieldReference;
import org.apache.spark.sql.connector.expressions.NamedReference;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperation;
import org.apache.spark.sql.connector.write.RowLevelOperationBuilder;
import org.apache.spark.sql.connector.write.RowLevelOperationInfo;
import org.apache.spark.sql.connector.write.SupportsTruncate;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.sources.And;
import org.apache.spark.sql.sources.EqualTo;
import org.apache.spark.sql.sources.Filter;
import org.apache.spark.sql.sources.GreaterThan;
import org.apache.spark.sql.sources.GreaterThanOrEqual;
import org.apache.spark.sql.sources.In;
import org.apache.spark.sql.sources.IsNotNull;
import org.apache.spark.sql.sources.IsNull;
import org.apache.spark.sql.sources.LessThan;
import org.apache.spark.sql.sources.LessThanOrEqual;
import org.apache.spark.sql.sources.Not;
import org.apache.spark.sql.sources.Or;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * Minimal in-memory Spark DataSource V2 catalog with REAL row-level
 * operation support: DELETE FROM (filter pushdown via SupportsDelete and
 * arbitrary predicates via the group-based rewrite), UPDATE, and MERGE
 * INTO (copy-on-write ReplaceData with the whole table as the single
 * rewrite group).
 *
 * Purpose: the sandbox ships no Delta/Iceberg jars, so this is the
 * transactional backend that lets operators/table.py's CatalogTable run
 * its MERGE/DELETE SQL end-to-end through Spark's analyzer, the
 * RewriteMergeIntoTable / RewriteDeleteFromTable rules, and a real
 * BatchWrite commit protocol. Built ONLY from the public Spark connector
 * API (the same interfaces Delta/Iceberg implement).
 *
 * SINGLE-JVM scope, by design: rows live in a static map keyed by
 * catalog+identifier, which executors resolve in-process — correct under
 * local[*] (the test/CI topology) and never usable on a multi-JVM
 * cluster, exactly like Spark's own in-memory test catalogs. Writes are
 * copy-on-write: every task buffers row copies, and the table swaps its
 * row list atomically at commit, so a failed/aborted job leaves the
 * previous contents intact.
 */
public class MemoryCatalog implements TableCatalog, SupportsNamespaces {

  /** catalog-name!db.table -> state; static = shared across the JVM. */
  static final ConcurrentHashMap<String, TableState> TABLES = new ConcurrentHashMap<>();

  static final class TableState implements Serializable {
    final StructType schema;
    volatile List<InternalRow> rows = Collections.emptyList();
    // snapshot history: one immutable row-list + wall-clock micros per
    // commit (version 0 = the empty table at creation) — what VERSION AS
    // OF / TIMESTAMP AS OF reads resolve against, Iceberg-style.
    final List<List<InternalRow>> snapshots = new ArrayList<>();
    final List<Long> snapshotMicros = new ArrayList<>();

    TableState(StructType schema) {
      this.schema = schema;
      snapshots.add(rows);
      snapshotMicros.add(System.currentTimeMillis() * 1000L);
    }

    synchronized void replace(List<InternalRow> next) {
      rows = Collections.unmodifiableList(next);
      snapshots.add(rows);
      snapshotMicros.add(System.currentTimeMillis() * 1000L);
    }

    synchronized void append(List<InternalRow> extra) {
      List<InternalRow> next = new ArrayList<>(rows);
      next.addAll(extra);
      replace(next);
    }

    synchronized int currentVersion() {
      return snapshots.size() - 1;
    }

    // reads of the snapshot lists synchronize with the commit-side adds
    // (ArrayList append can resize its backing array; an unsynchronized
    // reader has no happens-before edge and can observe a torn array)
    synchronized List<InternalRow> snapshotAt(int v) {
      return snapshots.get(v);
    }

    synchronized int snapshotCount() {
      return snapshots.size();
    }

    synchronized long snapshotMicrosAt(int i) {
      return snapshotMicros.get(i);
    }
  }

  private String name = "memcat";
  private final Set<String> namespaces = ConcurrentHashMap.newKeySet();

  @Override
  public void initialize(String name, CaseInsensitiveStringMap options) {
    this.name = name;
    namespaces.add("default");
  }

  @Override
  public String name() {
    return name;
  }

  private String key(Identifier ident) {
    return name + "!" + String.join(".", ident.namespace()) + "." + ident.name();
  }

  // -- tables ---------------------------------------------------------------

  @Override
  public Identifier[] listTables(String[] namespace) {
    String prefix = name + "!" + String.join(".", namespace) + ".";
    return TABLES.keySet().stream()
        .filter(k -> k.startsWith(prefix))
        .map(k -> Identifier.of(namespace, k.substring(prefix.length())))
        .toArray(Identifier[]::new);
  }

  @Override
  public Table loadTable(Identifier ident) throws NoSuchTableException {
    TableState st = TABLES.get(key(ident));
    if (st == null) {
      throw new NoSuchTableException(ident);
    }
    return new MemTable(key(ident), st);
  }

  @Override
  public Table loadTable(Identifier ident, String version)
      throws NoSuchTableException {
    TableState st = TABLES.get(key(ident));
    if (st == null) {
      throw new NoSuchTableException(ident);
    }
    int v;
    try {
      v = Integer.parseInt(version);
    } catch (NumberFormatException e) {
      throw new IllegalArgumentException(
          "memcat versions are integer commit ordinals, got: " + version);
    }
    if (v < 0 || v >= st.snapshotCount()) {
      throw new IllegalArgumentException(
          "no version " + v + " (table has versions 0.."
              + st.currentVersion() + ")");
    }
    return new MemTable(key(ident), st, v);
  }

  @Override
  public Table loadTable(Identifier ident, long timestampMicros)
      throws NoSuchTableException {
    TableState st = TABLES.get(key(ident));
    if (st == null) {
      throw new NoSuchTableException(ident);
    }
    // latest snapshot committed at or before the timestamp
    int v = -1;
    for (int i = 0; i < st.snapshotCount(); i++) {
      if (st.snapshotMicrosAt(i) <= timestampMicros) {
        v = i;
      }
    }
    if (v < 0) {
      throw new IllegalArgumentException(
          "no snapshot at or before timestamp " + timestampMicros);
    }
    return new MemTable(key(ident), st, v);
  }

  @Override
  public Table createTable(
      Identifier ident, StructType schema, Transform[] partitions, Map<String, String> props)
      throws TableAlreadyExistsException {
    if (partitions.length > 0) {
      throw new UnsupportedOperationException("memcat tables are unpartitioned");
    }
    if (TABLES.putIfAbsent(key(ident), new TableState(schema)) != null) {
      throw new TableAlreadyExistsException(ident);
    }
    namespaces.add(String.join(".", ident.namespace()));
    return new MemTable(key(ident), TABLES.get(key(ident)));
  }

  @Override
  public Table alterTable(Identifier ident, TableChange... changes) {
    throw new UnsupportedOperationException("memcat does not support ALTER TABLE");
  }

  @Override
  public boolean dropTable(Identifier ident) {
    return TABLES.remove(key(ident)) != null;
  }

  @Override
  public void renameTable(Identifier from, Identifier to)
      throws NoSuchTableException, TableAlreadyExistsException {
    TableState st = TABLES.get(key(from));
    if (st == null) {
      throw new NoSuchTableException(from);
    }
    if (TABLES.putIfAbsent(key(to), st) != null) {
      throw new TableAlreadyExistsException(to);
    }
    TABLES.remove(key(from));
  }

  // -- namespaces -----------------------------------------------------------

  @Override
  public String[][] listNamespaces() {
    return namespaces.stream().map(n -> n.split("\\.")).toArray(String[][]::new);
  }

  @Override
  public String[][] listNamespaces(String[] namespace) {
    return new String[0][];
  }

  @Override
  public boolean namespaceExists(String[] namespace) {
    return true; // implicit namespaces: any CREATE TABLE path is valid
  }

  @Override
  public Map<String, String> loadNamespaceMetadata(String[] namespace)
      throws NoSuchNamespaceException {
    if (!namespaceExists(namespace)) {
      throw new NoSuchNamespaceException(namespace);
    }
    return Collections.emptyMap();
  }

  @Override
  public void createNamespace(String[] namespace, Map<String, String> metadata) {
    namespaces.add(String.join(".", namespace));
  }

  @Override
  public void alterNamespace(String[] namespace, NamespaceChange... changes) {
    throw new UnsupportedOperationException();
  }

  @Override
  public boolean dropNamespace(String[] namespace, boolean cascade) {
    return namespaces.remove(String.join(".", namespace));
  }

  // =========================================================================
  // table
  // =========================================================================

  /** Hidden metadata column: the row's position in the table's current
   * row list.  Declaring it as a REQUIRED metadata attribute of the
   * row-level operation is what switches Spark's ReplaceDataExec to the
   * projecting write task (DataAndMetadataWritingSparkTask) — without a
   * metadata projection, the raw MergeRows output (leading
   * __row_operation column) reaches the writer unprojected. */
  static final String POS_COL = "__mem_pos";

  static final MetadataColumn POS_METADATA =
      new MetadataColumn() {
        @Override
        public String name() {
          return POS_COL;
        }

        @Override
        public org.apache.spark.sql.types.DataType dataType() {
          return DataTypes.LongType;
        }

        @Override
        public boolean isNullable() {
          return false;
        }
      };

  static final class MemTable
      implements SupportsRead,
          SupportsWrite,
          SupportsDelete,
          SupportsRowLevelOperations,
          SupportsMetadataColumns {
    private final String key;
    private final TableState state;
    private final int pinnedVersion; // -1 = live table

    MemTable(String key, TableState state) {
      this(key, state, -1);
    }

    MemTable(String key, TableState state, int pinnedVersion) {
      this.key = key;
      this.state = state;
      this.pinnedVersion = pinnedVersion;
    }

    private void rejectWriteIfPinned() {
      if (pinnedVersion >= 0) {
        throw new UnsupportedOperationException(
            "cannot write to a time-travel (VERSION/TIMESTAMP AS OF) view");
      }
    }

    @Override
    public String name() {
      return key.substring(key.indexOf('!') + 1);
    }

    @Override
    public StructType schema() {
      return state.schema;
    }

    @Override
    public Set<TableCapability> capabilities() {
      return new HashSet<>(
          Arrays.asList(
              TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE));
    }

    @Override
    public MetadataColumn[] metadataColumns() {
      return new MetadataColumn[] {POS_METADATA};
    }

    // -- read ---------------------------------------------------------------

    @Override
    public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
      return () -> new MemScan(key, state.schema, false, pinnedVersion);
    }

    @Override
    public String version() {
      return String.valueOf(
          pinnedVersion >= 0 ? pinnedVersion : state.currentVersion());
    }

    // -- plain writes (INSERT INTO / INSERT OVERWRITE) ----------------------

    @Override
    public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
      rejectWriteIfPinned();
      return new MemWriteBuilder(key, info.schema(), false);
    }

    // -- DELETE FROM with translatable predicates ---------------------------

    @Override
    public boolean canDeleteWhere(Filter[] filters) {
      for (Filter f : filters) {
        if (!FilterEval.supported(f)) {
          return false; // fall back to the row-level rewrite path
        }
      }
      return true;
    }

    @Override
    public void deleteWhere(Filter[] filters) {
      rejectWriteIfPinned();
      List<InternalRow> keep = new ArrayList<>();
      for (InternalRow row : state.rows) {
        boolean match = true; // conjunction of filters must be TRUE
        for (Filter f : filters) {
          if (!Boolean.TRUE.equals(FilterEval.eval3(f, row, state.schema))) {
            match = false;
            break;
          }
        }
        if (!match) {
          keep.add(row);
        }
      }
      state.replace(keep);
    }

    // -- MERGE / UPDATE / complex DELETE: group-based copy-on-write ---------

    @Override
    public RowLevelOperationBuilder newRowLevelOperationBuilder(RowLevelOperationInfo info) {
      rejectWriteIfPinned();
      return () ->
          new RowLevelOperation() {
            @Override
            public Command command() {
              return info.command();
            }

            @Override
            public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
              return () -> new MemScan(key, state.schema, true, -1);
            }

            @Override
            public NamedReference[] requiredMetadataAttributes() {
              return new NamedReference[] {FieldReference.column(POS_COL)};
            }

            @Override
            public WriteBuilder newWriteBuilder(LogicalWriteInfo writeInfo) {
              // The scan covered the WHOLE table (one rewrite group), so
              // ReplaceData's commit swaps in the full rewritten contents.
              return new MemWriteBuilder(key, writeInfo.schema(), true);
            }
          };
    }
  }

  // =========================================================================
  // scan: one partition holding a snapshot reference
  // =========================================================================

  static final class MemScan implements Scan, Batch, Serializable {
    private final String key;
    private final StructType schema;
    private final boolean withPos;
    private final int version; // -1 = live rows

    MemScan(String key, StructType schema, boolean withPos, int version) {
      this.key = key;
      this.schema = schema;
      this.withPos = withPos;
      this.version = version;
    }

    @Override
    public StructType readSchema() {
      return withPos ? schema.add(POS_COL, DataTypes.LongType, false) : schema;
    }

    @Override
    public Batch toBatch() {
      return this;
    }

    @Override
    public InputPartition[] planInputPartitions() {
      return new InputPartition[] {new MemPartition(key, version)};
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
      return new MemReaderFactory(withPos);
    }
  }

  static final class MemPartition implements InputPartition {
    final String key;
    final int version;

    MemPartition(String key, int version) {
      this.key = key;
      this.version = version;
    }
  }

  static final class MemReaderFactory implements PartitionReaderFactory {
    private final boolean withPos;

    MemReaderFactory(boolean withPos) {
      this.withPos = withPos;
    }

    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      // same-JVM resolution (local[*] only — see class doc)
      MemPartition p = (MemPartition) partition;
      TableState st = TABLES.get(p.key);
      List<InternalRow> snapshot =
          st == null
              ? Collections.emptyList()
              : (p.version >= 0 ? st.snapshotAt(p.version) : st.rows);
      boolean pos = withPos;
      return new PartitionReader<InternalRow>() {
        private int i = -1;

        @Override
        public boolean next() {
          return ++i < snapshot.size();
        }

        @Override
        public InternalRow get() {
          InternalRow row = snapshot.get(i);
          if (!pos) {
            return row;
          }
          return new org.apache.spark.sql.catalyst.expressions.JoinedRow(
              row,
              new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                  new Object[] {(long) i}));
        }

        @Override
        public void close() {}
      };
    }
  }

  // =========================================================================
  // write: buffer copies per task, swap/append at driver commit
  // =========================================================================

  static final class MemWriteBuilder implements WriteBuilder, SupportsTruncate {
    private final String key;
    private final StructType schema;
    private boolean replaceAll;

    MemWriteBuilder(String key, StructType schema, boolean replaceAll) {
      this.key = key;
      this.schema = schema;
      this.replaceAll = replaceAll;
    }

    @Override
    public WriteBuilder truncate() {
      this.replaceAll = true;
      return this;
    }

    @Override
    public Write build() {
      boolean replace = replaceAll;
      String k = key;
      StructType sch = schema;
      return new Write() {
        @Override
        public BatchWrite toBatch() {
          return new MemBatchWrite(k, sch, replace);
        }
      };
    }
  }

  static final class MemWriterFactory implements DataWriterFactory {
    private final StructType schema;

    MemWriterFactory(StructType schema) {
      this.schema = schema;
    }

    @Override
    public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
      // Normalize every incoming representation (joined rows, projection
      // buffers) to a fresh UnsafeRow of exactly the write schema.
      org.apache.spark.sql.catalyst.expressions.UnsafeProjection proj =
          org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema);
      return new DataWriter<InternalRow>() {
        private final ArrayList<InternalRow> buffer = new ArrayList<>();

        @Override
        public void write(InternalRow record) throws IOException {
          buffer.add(proj.apply(record).copy());
        }

        @Override
        public WriterCommitMessage commit() {
          return new RowsMessage(buffer);
        }

        @Override
        public void abort() {
          buffer.clear();
        }

        @Override
        public void close() {}
      };
    }
  }

  static final class RowsMessage implements WriterCommitMessage {
    final ArrayList<InternalRow> rows;

    RowsMessage(ArrayList<InternalRow> rows) {
      this.rows = rows;
    }
  }

  static final class MemBatchWrite implements BatchWrite {
    private final String key;
    private final StructType schema;
    private final boolean replaceAll;

    MemBatchWrite(String key, StructType schema, boolean replaceAll) {
      this.key = key;
      this.schema = schema;
      this.replaceAll = replaceAll;
    }

    @Override
    public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      return new MemWriterFactory(schema);
    }

    @Override
    public void commit(WriterCommitMessage[] messages) {
      List<InternalRow> all = new ArrayList<>();
      for (WriterCommitMessage m : messages) {
        if (m != null) {
          all.addAll(((RowsMessage) m).rows);
        }
      }
      TableState st = TABLES.get(key);
      if (st == null) {
        throw new IllegalStateException("table dropped mid-write: " + key);
      }
      if (replaceAll) {
        st.replace(all);
      } else {
        st.append(all);
      }
    }

    @Override
    public void abort(WriterCommitMessage[] messages) {
      // copy-on-write: nothing was published, nothing to undo
    }
  }

  // =========================================================================
  // V1 filter evaluation over InternalRow (DELETE pushdown)
  // =========================================================================

  static final class FilterEval {
    static boolean supported(Filter f) {
      if (f instanceof And a) {
        return supported(a.left()) && supported(a.right());
      }
      if (f instanceof Or o) {
        return supported(o.left()) && supported(o.right());
      }
      if (f instanceof Not n) {
        return supported(n.child());
      }
      return f instanceof EqualTo
          || f instanceof GreaterThan
          || f instanceof GreaterThanOrEqual
          || f instanceof LessThan
          || f instanceof LessThanOrEqual
          || f instanceof IsNull
          || f instanceof IsNotNull
          || f instanceof In
          || f instanceof org.apache.spark.sql.sources.AlwaysTrue
          || f instanceof org.apache.spark.sql.sources.AlwaysFalse;
    }

    /** SQL three-valued logic: TRUE / FALSE / null (= UNKNOWN).  A row
     * is deleted only when the predicate is definitively TRUE —
     * Not(UNKNOWN) stays UNKNOWN, so NULL-bearing rows survive negated
     * predicates exactly as they do in Spark's own rewrite path. */
    static Boolean eval3(Filter f, InternalRow row, StructType schema) {
      if (f instanceof And a) {
        Boolean l = eval3(a.left(), row, schema);
        Boolean r = eval3(a.right(), row, schema);
        if (Boolean.FALSE.equals(l) || Boolean.FALSE.equals(r)) {
          return false;
        }
        return (l == null || r == null) ? null : true;
      }
      if (f instanceof Or o) {
        Boolean l = eval3(o.left(), row, schema);
        Boolean r = eval3(o.right(), row, schema);
        if (Boolean.TRUE.equals(l) || Boolean.TRUE.equals(r)) {
          return true;
        }
        return (l == null || r == null) ? null : false;
      }
      if (f instanceof Not n) {
        Boolean c = eval3(n.child(), row, schema);
        return c == null ? null : !c;
      }
      if (f instanceof org.apache.spark.sql.sources.AlwaysTrue) {
        return true;
      }
      if (f instanceof org.apache.spark.sql.sources.AlwaysFalse) {
        return false;
      }
      if (f instanceof IsNull p) {
        return valueAt(row, schema, p.attribute()) == null;
      }
      if (f instanceof IsNotNull p) {
        return valueAt(row, schema, p.attribute()) != null;
      }
      if (f instanceof EqualTo p) {
        Integer c = compareNullable(row, schema, p.attribute(), p.value());
        return c == null ? null : c == 0;
      }
      if (f instanceof GreaterThan p) {
        Integer c = compareNullable(row, schema, p.attribute(), p.value());
        return c == null ? null : c > 0;
      }
      if (f instanceof GreaterThanOrEqual p) {
        Integer c = compareNullable(row, schema, p.attribute(), p.value());
        return c == null ? null : c >= 0;
      }
      if (f instanceof LessThan p) {
        Integer c = compareNullable(row, schema, p.attribute(), p.value());
        return c == null ? null : c < 0;
      }
      if (f instanceof LessThanOrEqual p) {
        Integer c = compareNullable(row, schema, p.attribute(), p.value());
        return c == null ? null : c <= 0;
      }
      if (f instanceof In p) {
        Object v = valueAt(row, schema, p.attribute());
        if (v == null) {
          return null; // NULL IN (...) is UNKNOWN
        }
        boolean sawNull = false;
        for (Object candidate : p.values()) {
          if (candidate == null) {
            sawNull = true;
            continue;
          }
          if (compareValues(v, toCatalyst(candidate)) == 0) {
            return true;
          }
        }
        return sawNull ? null : false; // x IN (..., NULL) without a match
      }
      throw new UnsupportedOperationException("unsupported delete filter: " + f);
    }

    private static Object valueAt(InternalRow row, StructType schema, String attr) {
      int i = schema.fieldIndex(attr);
      if (row.isNullAt(i)) {
        return null;
      }
      DataType dt = ((StructField) schema.apply(i)).dataType();
      return row.get(i, dt);
    }

    private static Object toCatalyst(Object external) {
      return CatalystTypeConverters.convertToCatalyst(external);
    }

    private static Integer compareNullable(
        InternalRow row, StructType schema, String attr, Object literal) {
      Object v = valueAt(row, schema, attr);
      if (v == null || literal == null) {
        return null; // SQL null comparison semantics: unknown -> no match
      }
      return compareValues(v, toCatalyst(literal));
    }

    @SuppressWarnings({"unchecked", "rawtypes"})
    private static int compareValues(Object a, Object b) {
      if (a instanceof Number x && b instanceof Number y) {
        return new BigDecimal(x.toString()).compareTo(new BigDecimal(y.toString()));
      }
      if (a.getClass() == b.getClass() && a instanceof Comparable) {
        return ((Comparable) a).compareTo(b);
      }
      return a.toString().compareTo(b.toString());
    }
  }
}
