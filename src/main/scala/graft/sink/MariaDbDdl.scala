package graft.sink

import org.apache.spark.sql.DataFrame

/** The reference pipeline's database schema, as data (SURVEY.md §2.1 S7).
  *
  * The reference ships its MariaDB DDL as inline strings, one per Dagster
  * asset (reference: etl_textreuse/database_assets/ids_and_mappings.py:15-26,
  * coverages.py:14-35, reception.py:14-31, downstream_clusters.py:15-27,
  * downstream_metadata.py:15-26 — every table is `ENGINE=Aria
  * PAGE_CHECKSUM=0 TRANSACTIONAL=0`, ids are `int(11) unsigned` except the
  * 64-bit `piece_id`, and secondary indexes are applied AFTER the bulk load
  * with `ALTER TABLE ... ADD INDEX IF NOT EXISTS`).
  *
  * Here the same schema is a column/key spec per table plus two renderers:
  *
  *  - [[TableSpec.mariadbCreate]] / [[TableSpec.mariadbIndex]] — the
  *    MariaDB dialect, byte-for-byte the reference's semantics (Aria
  *    engine options, unsigned display-width types, post-load index ALTER)
  *    so a user can point this engine at the reference's actual database.
  *  - [[TableSpec.ansiCreate]] / [[TableSpec.ansiIndexDdl]] — a
  *    dialect-neutral translation (executable on Derby/Postgres-class
  *    engines): unsigned 32-bit columns become BIGINT (INTEGER cannot hold
  *    [2³¹, 2³²), which the unsigned contract allows) with the range
  *    enforced at load time by `Jdbc.withNarrowedIds`, `text` → CLOB, and
  *    index names are table-prefixed because the index namespace is
  *    schema-wide outside MySQL/MariaDB.
  *
  * [[TableSpec.load]] wires a spec through [[Jdbc.loadTable]] with the
  * table's 32-bit columns as the `narrow32Ids` guard, so the load aborts
  * loudly on a value the MariaDB type would silently wrap.
  */
object MariaDbDdl {

  sealed trait SqlType
  /** `int(11) unsigned` — the reference's 32-bit id/count type. */
  case object U32 extends SqlType
  /** `bigint(20) unsigned` — piece_id only (downstream_clusters.py:18). */
  case object U64 extends SqlType
  /** `double unsigned` — coverage proportions. */
  case object UDouble extends SqlType
  final case class Varchar(n: Int) extends SqlType
  case object Text extends SqlType
  case object DateType extends SqlType

  sealed trait Nullability
  case object NotNull extends Nullability
  /** Explicit `DEFAULT NULL` in the reference DDL. */
  case object DefaultNull extends Nullability
  /** No modifier (nullable by default). */
  case object Bare extends Nullability

  final case class Col(name: String, tpe: SqlType, nulls: Nullability = NotNull)

  sealed trait Key
  final case class PrimaryKey(cols: Seq[String]) extends Key
  final case class Index(name: String, cols: Seq[String]) extends Key
  final case class UniqueKey(name: String, cols: Seq[String]) extends Key

  final case class TableSpec(name: String, cols: Seq[Col], keys: Seq[Key]) {

    private def mariadbType(t: SqlType): String = t match {
      case U32        => "int(11) unsigned"
      case U64        => "bigint(20) unsigned"
      case UDouble    => "double unsigned"
      case Varchar(n) => s"varchar($n)"
      case Text       => "text"
      case DateType   => "date"
    }

    private def mariadbNulls(n: Nullability): String = n match {
      case NotNull     => " NOT NULL"
      case DefaultNull => " DEFAULT NULL"
      case Bare        => ""
    }

    /** MariaDB `CREATE TABLE` — the reference's engine options verbatim. */
    def mariadbCreate: String = {
      val colLines = cols.map(c =>
        s"  `${c.name}` ${mariadbType(c.tpe)}${mariadbNulls(c.nulls)}")
      s"CREATE TABLE IF NOT EXISTS `$name` (\n" +
        colLines.mkString(",\n") +
        "\n) ENGINE=Aria PAGE_CHECKSUM=0 TRANSACTIONAL=0;"
    }

    /** MariaDB post-load index DDL — one ALTER, bulk-load-then-index like
      * the reference (indexes built once over sorted data beat per-row
      * index maintenance during a 100 TB load).
      */
    def mariadbIndex: String = {
      val adds = keys.map {
        case PrimaryKey(cs) =>
          s"  ADD PRIMARY KEY (${cs.map(c => s"`$c`").mkString(",")})"
        case Index(n, cs) =>
          s"  ADD INDEX IF NOT EXISTS `$n` (${cs.map(c => s"`$c`").mkString(",")})"
        case UniqueKey(n, cs) =>
          s"  ADD UNIQUE KEY `$n` (${cs.map(c => s"`$c`").mkString(",")})"
      }
      s"ALTER TABLE `$name`\n" + adds.mkString(",\n") + ";"
    }

    private def ansiType(t: SqlType): String = t match {
      case U32        => "BIGINT" // holds the full unsigned-32 range
      case U64        => "BIGINT"
      case UDouble    => "DOUBLE"
      case Varchar(n) => s"VARCHAR($n)"
      case Text       => "CLOB"
      case DateType   => "DATE"
    }

    /** Dialect-neutral `CREATE TABLE` (runs on Derby as-is). */
    def ansiCreate: String = {
      val colLines = cols.map { c =>
        val nn = if (c.nulls == NotNull) " NOT NULL" else ""
        s"  ${c.name} ${ansiType(c.tpe)}$nn"
      }
      s"CREATE TABLE $name (\n" + colLines.mkString(",\n") + "\n)"
    }

    /** Dialect-neutral index statements; names are table-prefixed because
      * the index namespace is per-schema outside MySQL/MariaDB.
      */
    def ansiIndexDdl: Seq[String] = keys.map {
      case PrimaryKey(cs) =>
        s"ALTER TABLE $name ADD CONSTRAINT pk_$name PRIMARY KEY (${cs.mkString(",")})"
      case Index(n, cs) =>
        s"CREATE INDEX ${name}_$n ON $name (${cs.mkString(",")})"
      case UniqueKey(n, cs) =>
        s"CREATE UNIQUE INDEX ${name}_$n ON $name (${cs.mkString(",")})"
    }

    /** Columns under the reference's 32-bit unsigned contract — every
      * `int(11) unsigned` column, ids and counts alike: all of them wrap
      * identically in the database if a 64-bit Spark value outgrows them.
      */
    def narrow32Cols: Seq[String] = cols.collect { case Col(n, U32, _) => n }

    /** Bulk-load `df` into this table via [[Jdbc.loadTable]], in the given
      * dialect, with the 32-bit range guard on every `int(11) unsigned`
      * column.
      */
    def load(df: DataFrame, url: String, mariadb: Boolean = true,
        batchSize: Int = 100000, numPartitions: Int = 8): Jdbc.LoadResult =
      if (mariadb)
        Jdbc.loadTable(df, url, name, mariadbCreate, Seq(mariadbIndex),
          batchSize, numPartitions, narrow32Cols)
      else
        Jdbc.loadTable(df, url, name, ansiCreate, ansiIndexDdl,
          batchSize, numPartitions, narrow32Cols)
  }

  // ---- ids and mappings (ids_and_mappings.py) ----

  val textreuseIds: TableSpec = TableSpec("textreuse_ids",
    Seq(Col("trs_id", U32),
      Col("text_name", Varchar(100), Bare),
      Col("manifestation_id", Varchar(100), Bare),
      Col("structure_name", Varchar(100), Bare)),
    Seq(PrimaryKey(Seq("trs_id")),
      Index("manifestation_trs_composite", Seq("manifestation_id", "trs_id"))))

  val manifestationIds: TableSpec = TableSpec("manifestation_ids",
    Seq(Col("manifestation_id_i", U32),
      Col("manifestation_id", Varchar(100), Bare)),
    Seq(PrimaryKey(Seq("manifestation_id_i")),
      Index("manifestation_covering", Seq("manifestation_id", "manifestation_id_i"))))

  val editionIds: TableSpec = TableSpec("edition_ids",
    Seq(Col("edition_id_i", U32),
      Col("edition_id", Varchar(100), Bare)),
    Seq(PrimaryKey(Seq("edition_id_i")),
      Index("edition_covering", Seq("edition_id", "edition_id_i"))))

  val workIds: TableSpec = TableSpec("work_ids",
    Seq(Col("work_id_i", U32),
      Col("work_id", Varchar(2858), Bare)),
    Seq(PrimaryKey(Seq("work_id_i"))))

  val textreuseManifestationMapping: TableSpec = TableSpec(
    "textreuse_manifestation_mapping",
    Seq(Col("trs_id", U32), Col("manifestation_id_i", U32)),
    Seq(Index("trs_id", Seq("trs_id")),
      Index("manifestation_id_i", Seq("manifestation_id_i"))))

  val textreuseWorkMapping: TableSpec = TableSpec("textreuse_work_mapping",
    Seq(Col("trs_id", U32), Col("work_id_i", U32)),
    Seq(Index("trs_id", Seq("trs_id")),
      Index("work_id_i", Seq("work_id_i"))))

  val textreuseEditionMapping: TableSpec = TableSpec("textreuse_edition_mapping",
    Seq(Col("trs_id", U32), Col("edition_id_i", U32)),
    Seq(Index("trs_id", Seq("trs_id")),
      Index("edition_id_i", Seq("edition_id_i"))))

  val editionMapping: TableSpec = TableSpec("edition_mapping",
    Seq(Col("manifestation_id_i", U32), Col("edition_id_i", U32)),
    Seq(Index("manifestation_id_i", Seq("manifestation_id_i")),
      Index("edition_id_i", Seq("edition_id_i"))))

  val workMapping: TableSpec = TableSpec("work_mapping",
    Seq(Col("manifestation_id_i", U32), Col("work_id_i", U32)),
    Seq(Index("manifestation_id_i", Seq("manifestation_id_i")),
      Index("work_id_i", Seq("work_id_i"))))

  // ---- coverages (coverages.py) ----

  val receptionInceptionCoverages: TableSpec = TableSpec(
    "reception_inception_coverages",
    Seq(Col("src_trs_id", U32),
      Col("num_reuses_src", U32, DefaultNull),
      Col("reuses_src_in_dst", U32, DefaultNull),
      Col("src_length", U32, DefaultNull),
      Col("coverage_src_in_dst", UDouble, DefaultNull),
      Col("dst_trs_id", U32),
      Col("num_reuses_dst", U32, DefaultNull),
      Col("reuses_dst_in_src", U32, DefaultNull),
      Col("dst_length", U32, DefaultNull),
      Col("coverage_dst_in_src", UDouble, DefaultNull)),
    Seq(Index("src_trs_id", Seq("src_trs_id")),
      Index("reception", Seq("coverage_src_in_dst")),
      Index("dst_trs_id", Seq("dst_trs_id")),
      Index("inception", Seq("coverage_dst_in_src"))))

  val coverages: TableSpec = TableSpec("coverages",
    Seq(Col("trs1_id", U32),
      Col("t1_reuses", U32, DefaultNull),
      Col("reuse_t1_t2", U32, DefaultNull),
      Col("t1_length", U32, DefaultNull),
      Col("coverage_t1_t2", UDouble, DefaultNull),
      Col("trs2_id", U32),
      Col("t2_reuses", U32, DefaultNull),
      Col("reuse_t2_t1", U32, DefaultNull),
      Col("t2_length", U32, DefaultNull),
      Col("coverage_t2_t1", UDouble, DefaultNull)),
    Seq(Index("trs1_id", Seq("trs1_id")),
      Index("coverage_t1_t2", Seq("coverage_t1_t2")),
      Index("trs2_id", Seq("trs2_id")),
      Index("coverage_t2_t1", Seq("coverage_t2_t1"))))

  // ---- reception (reception.py) ----

  val receptionEdgesDenorm: TableSpec = TableSpec("reception_edges_denorm",
    Seq(Col("src_trs_id", U32), Col("src_trs_start", U32), Col("src_trs_end", U32),
      Col("dst_trs_id", U32), Col("dst_trs_start", U32), Col("dst_trs_end", U32)),
    Seq(Index("src_trs_id", Seq("src_trs_id")),
      Index("dst_trs_id", Seq("dst_trs_id"))))

  val nonSourcePieces: TableSpec = TableSpec("non_source_pieces",
    Seq(Col("cluster_id", U32), Col("piece_id", U64)),
    Seq(UniqueKey("cluster_covering", Seq("cluster_id", "piece_id")),
      UniqueKey("piece_covering", Seq("piece_id", "cluster_id"))))

  // ---- downstream clusters (downstream_clusters.py) ----

  val clusteredDefragPieces: TableSpec = TableSpec("clustered_defrag_pieces",
    Seq(Col("piece_id", U64), Col("cluster_id", U32)),
    Seq(PrimaryKey(Seq("piece_id")),
      Index("cluster_covering", Seq("cluster_id", "piece_id"))))

  val earliestManifestationAndPiecesByCluster: TableSpec = TableSpec(
    "earliest_manifestation_and_pieces_by_cluster",
    Seq(Col("cluster_id", U32), Col("manifestation_id_i", U32), Col("piece_id", U64)),
    Seq(Index("cluster_id", Seq("cluster_id")),
      Index("manifestation_id_i", Seq("manifestation_id_i")),
      Index("piece_id", Seq("piece_id"))))

  // ---- downstream metadata (downstream_metadata.py) ----

  val manifestationPublicationDate: TableSpec = TableSpec(
    "manifestation_publication_date",
    Seq(Col("manifestation_id_i", U32), Col("publication_date", DateType, DefaultNull)),
    Seq(PrimaryKey(Seq("manifestation_id_i"))))

  val editionPublicationDate: TableSpec = TableSpec("edition_publication_date",
    Seq(Col("edition_id_i", U32), Col("publication_date", DateType, DefaultNull)),
    // editions may carry several candidate publication dates, so a
    // covering index instead of a primary key (downstream_metadata.py:44)
    Seq(Index("edition_covering", Seq("edition_id_i", "publication_date"))))

  val workEarliestPublicationDate: TableSpec = TableSpec(
    "work_earliest_publication_date",
    Seq(Col("work_id_i", U32), Col("publication_date", DateType, DefaultNull)),
    Seq(PrimaryKey(Seq("work_id_i"))))

  val manifestationTitle: TableSpec = TableSpec("manifestation_title",
    Seq(Col("manifestation_id_i", U32), Col("title", Text, DefaultNull)),
    Seq(PrimaryKey(Seq("manifestation_id_i"))))

  val actorIds: TableSpec = TableSpec("actor_ids",
    Seq(Col("actor_id_i", U32),
      Col("actor_id", Varchar(100), Bare),
      Col("name_unified", Text, Bare)),
    Seq(PrimaryKey(Seq("actor_id_i")),
      Index("actor_composite", Seq("actor_id", "actor_id_i"))))

  val editionAuthors: TableSpec = TableSpec("edition_authors",
    Seq(Col("edition_id_i", U32), Col("actor_id_i", U32, DefaultNull)),
    Seq(Index("edition_id_i", Seq("edition_id_i")),
      Index("actor_id_i", Seq("actor_id_i"))))

  val textreuseSourceLengths: TableSpec = TableSpec("textreuse_source_lengths",
    Seq(Col("trs_id", U32), Col("text_length", U32, DefaultNull)),
    Seq(PrimaryKey(Seq("trs_id"))))

  /** Every database table the reference loads, in asset order. */
  val all: Seq[TableSpec] = Seq(
    textreuseIds, manifestationIds, editionIds, workIds,
    textreuseManifestationMapping, textreuseWorkMapping,
    textreuseEditionMapping, editionMapping, workMapping,
    receptionInceptionCoverages, coverages,
    receptionEdgesDenorm, nonSourcePieces,
    clusteredDefragPieces, earliestManifestationAndPiecesByCluster,
    manifestationPublicationDate, editionPublicationDate,
    workEarliestPublicationDate, manifestationTitle,
    actorIds, editionAuthors, textreuseSourceLengths)

  val byName: Map[String, TableSpec] = all.map(t => t.name -> t).toMap
}
