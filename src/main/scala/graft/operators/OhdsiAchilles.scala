package graft.operators

import graft.model.CdmModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** LITERAL OHDSI Achilles analysis-id compatibility
  * (round-5 verdict "Next round" #3).
  *
  * The reference executes the vendored Achilles analysis SQLs keyed by the
  * ids of `achilles_analysis_details.csv` and stores
  * `(analysis_id, stratum_1..5, count_value)` rows downstream OHDSI tooling
  * (Atlas/Ares) joins against the populated `achilles_analysis` catalog
  * table (`/root/reference/src/riab/etl/achilles.py:54-227` analysis list,
  * `:190-200` `_create_and_populate_analysis_table`, `:465-505` run). The
  * submodule carrying the literal CSVs is a stub in this checkout, so this
  * object vendors the PUBLIC core id set (the well-documented Achilles
  * convention: person analyses 0-5, observation-period 100s, then one
  * domain series per CDM event table with `x00` = persons with at least
  * one record by concept and `x01` = records by concept) and re-expresses
  * each analysis as a Spark aggregation over the CDM model.
  *
  * [[analysisCatalog]] is the `achilles_analysis` table; [[cdmCoreResults]]
  * produces `achilles_results`(+`_dist`) rows carrying these literal ids,
  * so stored results are keyed exactly as OHDSI tooling expects.
  */
object OhdsiAchilles {

  /** One catalog row of the vendored core set. */
  final case class CoreAnalysis(
      id: Long, name: String, stratum1: String = "", stratum2: String = "",
      isDist: Boolean = false, stratum3: String = "", stratum4: String = "")

  /** One CDM event-table series of the public Achilles id convention:
    * `base+0` persons by concept, `+1` records by concept, `+2` persons by
    * start month by concept, `+3` distinct concepts per person (DIST,
    * absent for death — one row per person), `+5` records by concept by
    * type concept (absent where CDM 5.4 has no `_type_concept_id`: death
    * and the era tables), `+6` age at
    * first occurrence by concept (DIST; death's age-at-death is the
    * special 506), `+7` records with invalid person_id (occurrence tables
    * only — for the era tables the published `x07` slot is the era-length
    * distribution instead), `+20` records by start month.
    */
  final case class DomainDef(
      table: String, base: Long, concept: String, startDate: String,
      typeCol: Option[String] = None, perPersonDist: Boolean = true,
      endDate: Option[String] = None)

  /** The occurrence tables carrying the `x07` invalid-person-id and `x20`
    * records-by-month slots (era tables and death use those ids
    * differently in the published catalog, so they are excluded).
    * specimen and note joined in round 15 — their published families
    * (2400/2200 blocks) carry the same record-validity sub-ids under the
    * id convention.
    */
  private val OccurrenceTables = Set(
    "visit_occurrence", "visit_detail", "condition_occurrence",
    "procedure_occurrence", "drug_exposure", "observation", "measurement",
    "device_exposure", "specimen", "note")

  /** The era tables: their `x07` slot is the era-length distribution (not
    * the occurrence tables' invalid-person-id count), and their validity
    * checks live in the dedicated 908-910 / 1008-1010 / 1308-1310 rows
    * (invalid person, end-before-start, invalid concept — in the catalog
    * since r12). The published catalog also carries their
    * records-by-start-month series (920 / 1020 / 1320).
    */
  private val EraTables = Set("drug_era", "condition_era", "dose_era")

  /** Published duration distributions keyed off an end-date column:
    * 211 length of stay, 907/1007/1307 era lengths.
    */
  val DurationDists: Map[String, (Long, String)] = Map(
    "visit_occurrence" -> (211L, "Distribution of length of stay, by visit_concept_id"),
    "visit_detail" -> (2511L,
      "Distribution of visit detail length of stay, by visit_detail_concept_id"),
    "drug_era" -> (907L, "Distribution of drug era length, by drug_concept_id"),
    "condition_era" -> (1007L, "Distribution of condition era length, by condition_concept_id"),
    "dose_era" -> (1307L, "Distribution of dose era length, by drug_concept_id"))

  /** The domain series of the CDM event tables (public Achilles id
    * convention).
    */
  val DomainSeries: Seq[DomainDef] = Seq(
    DomainDef("visit_occurrence", 200L, "visit_concept_id", "visit_start_date",
      typeCol = Some("visit_type_concept_id"), endDate = Some("visit_end_date")),
    DomainDef("condition_occurrence", 400L, "condition_concept_id", "condition_start_date",
      typeCol = Some("condition_type_concept_id"),
      endDate = Some("condition_end_date")),
    DomainDef("death", 500L, "cause_concept_id", "death_date", perPersonDist = false),
    DomainDef("procedure_occurrence", 600L, "procedure_concept_id", "procedure_date",
      typeCol = Some("procedure_type_concept_id")),
    DomainDef("drug_exposure", 700L, "drug_concept_id", "drug_exposure_start_date",
      typeCol = Some("drug_type_concept_id"), endDate = Some("drug_exposure_end_date")),
    DomainDef("observation", 800L, "observation_concept_id", "observation_date",
      typeCol = Some("observation_type_concept_id")),
    DomainDef("drug_era", 900L, "drug_concept_id", "drug_era_start_date",
      endDate = Some("drug_era_end_date")),
    DomainDef("condition_era", 1000L, "condition_concept_id", "condition_era_start_date",
      endDate = Some("condition_era_end_date")),
    // dose_era rides the published 1300 block (the dose-stratified sibling
    // of drug_era; `achilles.py` runs whatever ids the details CSV carries
    // — 1300s are the dose-era family in the public catalog)
    DomainDef("dose_era", 1300L, "drug_concept_id", "dose_era_start_date",
      endDate = Some("dose_era_end_date")),
    DomainDef("measurement", 1800L, "measurement_concept_id", "measurement_date",
      typeCol = Some("measurement_type_concept_id")),
    DomainDef("device_exposure", 2100L, "device_concept_id", "device_exposure_start_date",
      typeCol = Some("device_type_concept_id"),
      endDate = Some("device_exposure_end_date")),
    DomainDef("specimen", 2400L, "specimen_concept_id", "specimen_date",
      typeCol = Some("specimen_type_concept_id")),
    // visit_detail rides the published 2500 block (the visit_occurrence
    // sibling Achilles added with CDM 5.3+)
    DomainDef("visit_detail", 2500L, "visit_detail_concept_id",
      "visit_detail_start_date", typeCol = Some("visit_detail_type_concept_id"),
      endDate = Some("visit_detail_end_date")),
    // note rides the published 2200 block: its published 2200/2201 rows
    // ("persons with at least one note / note records, by
    // note_type_concept_id") are EXACTLY the x00/x01 shapes with the type
    // concept as the series concept, so the full series extends them by
    // convention (r15; CDM note has no separate type column beyond the
    // series concept, so no x05 slot)
    DomainDef("note", 2200L, "note_type_concept_id", "note_date"))

  /** The vendored core catalog (public Achilles `achilles_analysis_details`
    * entries; names follow the published wording).
    */
  val Catalog: Seq[CoreAnalysis] = Seq(
    CoreAnalysis(0L, "Source name"),
    CoreAnalysis(1L, "Number of persons"),
    CoreAnalysis(2L, "Number of persons by gender", "gender_concept_id"),
    CoreAnalysis(3L, "Number of persons by year of birth", "year_of_birth"),
    CoreAnalysis(4L, "Number of persons by race", "race_concept_id"),
    CoreAnalysis(5L, "Number of persons by ethnicity", "ethnicity_concept_id"),
    // 10/12: the published two-strata person demographics (year-of-birth x
    // gender, race x ethnicity)
    CoreAnalysis(10L, "Number of all persons by year of birth and by gender",
      "year_of_birth", "gender_concept_id"),
    CoreAnalysis(12L, "Number of persons by race and ethnicity",
      "race_concept_id", "ethnicity_concept_id"),
    CoreAnalysis(101L, "Number of persons by age, with age at first observation period", "age"),
    CoreAnalysis(102L, "Number of persons by gender by age, with age at first observation period",
      "gender_concept_id", "age"),
    CoreAnalysis(103L, "Distribution of age at first observation period", isDist = true),
    CoreAnalysis(104L, "Distribution of age at first observation period by gender",
      "gender_concept_id", isDist = true),
    CoreAnalysis(105L, "Length of observation (days) of first observation period", isDist = true),
    CoreAnalysis(106L,
      "Length of observation (days) of first observation period, by gender",
      "gender_concept_id", isDist = true),
    CoreAnalysis(107L,
      "Length of observation (days) of first observation period, by age decile",
      "age_decile", isDist = true),
    CoreAnalysis(108L,
      "Number of persons by length of first observation period, in 30d increments",
      "length_30d"),
    CoreAnalysis(109L, "Number of persons with continuous observation in each year",
      "calendar_year"),
    CoreAnalysis(110L, "Number of persons with continuous observation in each month",
      "calendar_month"),
    CoreAnalysis(111L, "Number of persons by observation period start month", "calendar_month"),
    CoreAnalysis(112L, "Number of persons by observation period end month", "calendar_month"),
    CoreAnalysis(113L, "Number of persons by number of observation periods", "num_periods"),
    CoreAnalysis(114L, "Number of persons with observation period before year-of-birth"),
    CoreAnalysis(115L, "Number of persons with observation period end < observation period start"),
    CoreAnalysis(116L,
      "Number of persons with at least one day of observation in each year, by gender and age decile",
      "calendar_year", "gender_concept_id", stratum3 = "age_decile"),
    CoreAnalysis(118L, "Number of observation period records with invalid person_id"),
    CoreAnalysis(117L, "Number of persons with observation period during each month",
      "calendar_month"),
    CoreAnalysis(119L, "Number of observation periods by period type concept",
      "period_type_concept_id"),
    CoreAnalysis(504L, "Distribution of age at death", isDist = true),
    CoreAnalysis(1406L,
      "Length of payer plan (days) of first payer plan period by gender",
      "gender_concept_id", isDist = true),
    CoreAnalysis(1407L,
      "Length of payer plan (days) of first payer plan period by age decile",
      "age_decile", isDist = true),
    CoreAnalysis(506L, "Distribution of age at death, by gender",
      "gender_concept_id", isDist = true),
    // 511-514: the published death-to-last-event time distributions
    CoreAnalysis(511L, "Distribution of time from death to last condition",
      isDist = true),
    CoreAnalysis(512L, "Distribution of time from death to last drug",
      isDist = true),
    CoreAnalysis(513L, "Distribution of time from death to last visit",
      isDist = true),
    CoreAnalysis(514L, "Distribution of time from death to last procedure",
      isDist = true),
    CoreAnalysis(1815L,
      "Distribution of numeric values, by measurement_concept_id and unit_concept_id",
      "measurement_concept_id", "unit_concept_id", isDist = true)) ++
    DurationDists.toSeq.sortBy(_._2._1).map { case (_, (id, name)) =>
      CoreAnalysis(id, name,
        DomainSeries.find(d => DurationDists.get(d.table).exists(_._1 == id)).get.concept,
        isDist = true)
    } ++
    DomainSeries.flatMap { d =>
      val entity = d.table.replace('_', ' ')
      Seq(
        CoreAnalysis(d.base, s"Number of persons with at least one $entity, by ${d.concept}",
          d.concept),
        CoreAnalysis(d.base + 1, s"Number of $entity records, by ${d.concept}", d.concept),
        // x02: the per-concept calendar-month prevalence series Atlas's
        // by-month trellis charts read (public Achilles id convention)
        CoreAnalysis(d.base + 2, s"Number of persons by $entity start month, by ${d.concept}",
          d.concept, "calendar_month")) ++
        // x03: distinct concepts per person (DIST)
        (if (d.perPersonDist)
          Seq(CoreAnalysis(d.base + 3,
            s"Number of distinct $entity concepts per person", isDist = true))
        else Nil) ++
        // x04: the Atlas drill-down — persons by concept by calendar year
        // by gender by age decile (published strata order)
        (if (d.table != "death")
          Seq(CoreAnalysis(d.base + 4,
            s"Number of persons with at least one $entity, by ${d.concept} by calendar year by gender by age decile",
            d.concept, "calendar_year",
            stratum3 = "gender_concept_id", stratum4 = "age_decile"))
        else Nil) ++
        // x05: records by concept by type concept
        d.typeCol.map(tc =>
          CoreAnalysis(d.base + 5, s"Number of $entity records, by ${d.concept} by $tc",
            d.concept, tc)).toSeq ++
        // x06: distribution of age at first occurrence, by concept (DIST;
        // death's age-at-death carries the special id 506 instead)
        (if (d.table != "death")
          Seq(CoreAnalysis(d.base + 6,
            s"Distribution of age at first $entity, by ${d.concept}", d.concept, isDist = true))
        else Nil) ++
        // x93/x94: per-person density distributions (records per person,
        // and days between first and last record per person) — graft
        // CONVENTION EXTENSIONS on the reserved x9x sub-id block (see
        // [[NonStandardIds]]), r15
        (if (d.table != "death")
          Seq(
            CoreAnalysis(d.base + 93,
              s"Distribution of number of $entity records per person", isDist = true),
            CoreAnalysis(d.base + 94,
              s"Distribution of days between first and last $entity per person",
              isDist = true))
        else Nil) ++
        // x07 / x08 / x09 / x20: occurrence tables only (the published era
        // catalogs use the +7 slot for era-length distributions). x09
        // (end date before start date) exists only where the table carries
        // an end date.
        (if (OccurrenceTables(d.table))
          Seq(
            CoreAnalysis(d.base + 7, s"Number of $entity records with invalid person_id"),
            CoreAnalysis(d.base + 8,
              s"Number of $entity records outside valid observation period"),
            CoreAnalysis(d.base + 20, s"Number of $entity records by $entity start month",
              "calendar_month")) ++
            d.endDate.map(_ => CoreAnalysis(d.base + 9,
              s"Number of $entity records with end date < start date")).toSeq
        else if (EraTables(d.table))
          // era validity family (public Achilles convention — the x07 slot
          // is the era-length distribution, so the validity checks shift
          // one: x08 invalid person, x09 outside valid observation period,
          // x10 era end < era start) plus the records-by-start-month
          // series (920 / 1020 / 1320)
          Seq(
            CoreAnalysis(d.base + 8, s"Number of $entity records with invalid person_id"),
            CoreAnalysis(d.base + 9,
              s"Number of $entity records outside valid observation period"),
            CoreAnalysis(d.base + 10, s"Number of $entity records with end date < start date"),
            CoreAnalysis(d.base + 20, s"Number of $entity records by $entity start month",
              "calendar_month"))
        else Nil)
    } ++
    // The cost domain (CDM 5.x unified `cost` table): fk-validity counts
    // plus the paid-amount distributions by event concept, following the
    // published Achilles 1500 (drug cost) / 1600 (procedure cost) id
    // blocks (`achilles.py:465-505` runs whatever ids the details CSV
    // carries; the CSV submodule is a stub in this checkout, so the
    // public id-block convention is the source).
    Seq(
      CoreAnalysis(1500L, "Number of drug cost records with invalid drug exposure id"),
      CoreAnalysis(1600L,
        "Number of procedure cost records with invalid procedure occurrence id")) ++
    Seq(("paid copay", 2L), ("paid coinsurance", 3L), ("paid toward deductible", 4L),
        ("paid by payer", 5L), ("paid by patient", 6L), ("total paid", 7L)).flatMap {
      case (nm, off) => Seq(
        CoreAnalysis(1500L + off, s"Distribution of $nm, by drug_concept_id",
          "drug_concept_id", isDist = true),
        CoreAnalysis(1600L + off, s"Distribution of $nm, by procedure_concept_id",
          "procedure_concept_id", isDist = true))
    } ++
    // The care-network tier: person fk-validity (7/8/9), provider (300s),
    // location (1100s), care site / place of service (1200s), payer plan
    // period (the published 1400-block mirrors the observation-period
    // sub-ids at +1300), cohort (1700s), the measurement value/range
    // family (1814/1816/1817), the persons-with-multiple-domains
    // treemap counts (2000s), and note (2200s) — all public Achilles id
    // conventions.
    Seq(
      CoreAnalysis(7L, "Number of persons with invalid provider_id"),
      CoreAnalysis(8L, "Number of persons with invalid location_id"),
      CoreAnalysis(9L, "Number of persons with invalid care_site_id"),
      CoreAnalysis(300L, "Number of providers"),
      CoreAnalysis(301L, "Number of providers by specialty",
        "specialty_concept_id"),
      CoreAnalysis(1100L, "Number of persons by location 3-digit zip", "zip3"),
      CoreAnalysis(1101L, "Number of persons by location state", "state"),
      CoreAnalysis(1102L, "Number of care sites by location 3-digit zip", "zip3"),
      CoreAnalysis(1103L, "Number of care sites by location state", "state"),
      CoreAnalysis(1200L, "Number of persons by place of service",
        "place_of_service_concept_id"),
      CoreAnalysis(1201L, "Number of visits by place of service",
        "place_of_service_concept_id"),
      CoreAnalysis(1202L, "Number of care sites by place of service",
        "place_of_service_concept_id"),
      // 1400-1403: the payer_source_value series (the x00/x01/x02/x03
      // shapes over payer_plan_period — CDM's payer dimension is the
      // source value, not a concept id; public Achilles id convention)
      CoreAnalysis(1400L,
        "Number of persons with at least one payer plan period, by payer_source_value",
        "payer_source_value"),
      CoreAnalysis(1401L, "Number of payer plan period records, by payer_source_value",
        "payer_source_value"),
      CoreAnalysis(1402L,
        "Number of persons by payer plan period start month, by payer_source_value",
        "payer_source_value", "calendar_month"),
      CoreAnalysis(1403L,
        "Number of distinct payer plan period values (payer_source_value) per person",
        isDist = true),
      CoreAnalysis(1408L,
        "Number of persons by length of first payer plan period, in 30d increments",
        "length_30d"),
      CoreAnalysis(1409L, "Number of persons with continuous payer coverage in each year",
        "calendar_year"),
      CoreAnalysis(1410L, "Number of persons with continuous payer coverage in each month",
        "calendar_month"),
      CoreAnalysis(1411L, "Number of persons by payer plan period start month",
        "calendar_month"),
      CoreAnalysis(1412L, "Number of persons by payer plan period end month",
        "calendar_month"),
      CoreAnalysis(1413L, "Number of persons by number of payer plan periods",
        "num_periods"),
      CoreAnalysis(1700L, "Number of records by cohort_definition_id",
        "cohort_definition_id"),
      CoreAnalysis(1701L, "Number of distinct subjects by cohort_definition_id",
        "cohort_definition_id"),
      CoreAnalysis(1814L, "Number of measurement records with no value (numeric or concept)"),
      CoreAnalysis(1821L, "Number of measurement records with no numeric value"),
      CoreAnalysis(1818L, "Number of measurement records with a value below the normal range"),
      CoreAnalysis(1819L, "Number of measurement records with a value above the normal range"),
      CoreAnalysis(1816L,
        "Distribution of low range, by measurement_concept_id and unit_concept_id",
        "measurement_concept_id", "unit_concept_id", isDist = true),
      CoreAnalysis(1817L,
        "Distribution of high range, by measurement_concept_id and unit_concept_id",
        "measurement_concept_id", "unit_concept_id", isDist = true),
      CoreAnalysis(2000L, "Number of persons with at least 1 Dx and 1 Rx"),
      CoreAnalysis(2001L, "Number of persons with at least 1 Dx and 1 Proc"),
      CoreAnalysis(2002L, "Number of persons with at least 1 Mx and 1 Dx and 1 Rx"),
      CoreAnalysis(2003L, "Number of persons with at least 1 Mx and 1 Rx"),
      // 2004: the domain-overlap profile Ares' upset chart reads —
      // stratum_1 is a presence bitmask over the event domains in the
      // published order (condition, drug, device, measurement, death,
      // procedure, observation)
      CoreAnalysis(2004L,
        "Number of distinct patients that overlap between specific domains",
        "domain_bitmask"),
      // 210: the published visit care-site fk-validity count (r15); 212:
      // the published concept-free visit data-density drill-down
      CoreAnalysis(210L, "Number of visit records with invalid care_site_id"),
      CoreAnalysis(212L,
        "Number of persons with at least one visit occurrence, by calendar year by gender by age decile",
        "calendar_year", "gender_concept_id", stratum3 = "age_decile"),
      // 2510/2512: the visit_detail convention siblings of 210/212 (r15)
      CoreAnalysis(2510L, "Number of visit detail records with invalid care_site_id"),
      CoreAnalysis(2512L,
        "Number of persons with at least one visit detail, by calendar year by gender by age decile",
        "calendar_year", "gender_concept_id", stratum3 = "age_decile"),
      // 1414/1415/1417/1418: the remaining observation-period mirrors of
      // the payer 1400 block (+1300 over 114/115/117/118 — the same
      // mirror convention as the shipped 1408-1413)
      CoreAnalysis(1414L, "Number of persons with payer plan period before year-of-birth"),
      CoreAnalysis(1415L,
        "Number of persons with payer plan period end < payer plan period start"),
      CoreAnalysis(1417L, "Number of persons with payer coverage during each month",
        "calendar_month"),
      CoreAnalysis(1418L, "Number of payer plan period records with invalid person_id"),
      // 1501/1601: the published cost blocks' second fk-validity slot
      // (payer plan period); 1509-1511 the drug-cost money distributions
      // beyond the shared six (ingredient cost / dispensing fee / amount
      // allowed — CDM 5.x cost columns); 1610 procedure cost by revenue
      // code
      CoreAnalysis(1501L,
        "Number of drug cost records with invalid payer plan period id"),
      CoreAnalysis(1601L,
        "Number of procedure cost records with invalid payer plan period id"),
      CoreAnalysis(1509L, "Distribution of ingredient cost paid, by drug_concept_id",
        "drug_concept_id", isDist = true),
      CoreAnalysis(1510L, "Distribution of dispensing fee paid, by drug_concept_id",
        "drug_concept_id", isDist = true),
      CoreAnalysis(1511L, "Distribution of amount allowed, by drug_concept_id",
        "drug_concept_id", isDist = true),
      CoreAnalysis(1610L, "Number of procedure cost records by revenue code",
        "revenue_code_concept_id")) ++
    // The round-9 parity additions (VERDICT r8 item 1): death type (505),
    // the drug amount dists (715 days_supply / 716 refills / 717
    // quantity), the records-per-person cumulative series (x91 — persons
    // with at least x records), and the observation value family (814 no
    // value / 815 numeric values by concept x unit) — all published
    // Achilles id conventions.
    Seq(
      CoreAnalysis(505L, "Number of death records, by death_type_concept_id",
        "death_type_concept_id"),
      CoreAnalysis(509L, "Number of death records with invalid person_id"),
      CoreAnalysis(510L,
        "Number of death records outside valid observation period"),
      CoreAnalysis(715L, "Distribution of days_supply by drug_concept_id",
        "drug_concept_id", isDist = true),
      CoreAnalysis(716L, "Distribution of refills by drug_concept_id",
        "drug_concept_id", isDist = true),
      CoreAnalysis(717L, "Distribution of quantity by drug_concept_id",
        "drug_concept_id", isDist = true),
      CoreAnalysis(291L, "Number of total persons that have at least x visit occurrences",
        "visit_occurrence_count"),
      CoreAnalysis(491L, "Number of total persons that have at least x condition occurrences",
        "condition_occurrence_count"),
      CoreAnalysis(691L, "Number of total persons that have at least x procedure occurrences",
        "procedure_occurrence_count"),
      CoreAnalysis(791L, "Number of total persons that have at least x drug exposures",
        "drug_exposure_count"),
      CoreAnalysis(814L, "Number of observation records with no value (numeric or concept)"),
      CoreAnalysis(815L,
        "Distribution of numeric values, by observation_concept_id and unit_concept_id",
        "observation_concept_id", "unit_concept_id", isDist = true),
      CoreAnalysis(891L, "Number of total persons that have at least x observations",
        "observation_count"),
      CoreAnalysis(1891L, "Number of total persons that have at least x measurements",
        "measurement_count"),
      CoreAnalysis(2191L, "Number of total persons that have at least x device exposures",
        "device_exposure_count"),
      CoreAnalysis(2591L, "Number of total persons that have at least x visit details",
        "visit_detail_count"),
      // r14: the x91 cumulative series extended to the era tables (the
      // same public id convention — base + 91)
      CoreAnalysis(991L, "Number of total persons that have at least x drug eras",
        "drug_era_count"),
      CoreAnalysis(1091L, "Number of total persons that have at least x condition eras",
        "condition_era_count"),
      CoreAnalysis(1391L, "Number of total persons that have at least x dose eras",
        "dose_era_count"),
      // r15: the x91 series completed over note and specimen
      CoreAnalysis(2291L, "Number of total persons that have at least x notes",
        "note_count"),
      CoreAnalysis(2491L, "Number of total persons that have at least x specimens",
        "specimen_count"))

  /** Ids carried by this catalog under the PUBLIC Achilles id CONVENTION
    * but not verifiable against the published `achilles_analysis_details`
    * CSV from this checkout (the Achilles submodule is an empty stub —
    * ADVICE r14): the x91 at-least-x cumulative series beyond the
    * occurrence tables (991/1091/1391/2291/2491), the whole x93/x94
    * per-person density block (a graft extension on the reserved x9x
    * sub-id range), the payer 1400-block observation-period mirrors
    * (1408-1418), the dose-era 1300 block, the specimen 2400 and
    * visit_detail 2500 series, the note 2200 series beyond the published
    * 2200/2201, and the cost money-dist offsets (1502-1511/1602-1607,
    * 1610). A future upstream id collision is possible in principle;
    * consumers validating against the upstream catalog should treat these
    * as graft-specific until cross-checked against a real Achilles
    * checkout.
    */
  lazy val NonStandardIds: Set[Long] =
    (Set(991L, 1091L, 1391L, 2291L, 2491L) ++
      DomainSeries.filter(_.table != "death").flatMap(d =>
        Seq(d.base + 93, d.base + 94)) ++
      (1408L to 1418L).toSet ++
      DomainSeries.filter(d => Set("dose_era", "specimen", "visit_detail")(d.table))
        .flatMap(d => Catalog.collect { case a if a.id / 100 == d.base / 100 => a.id }) ++
      Catalog.collect { case a if a.id >= 2202 && a.id < 2300 => a.id } ++
      (1502L to 1511L).toSet ++ (1602L to 1610L).toSet).toSet

  /** The populated `achilles_analysis` catalog table
    * (`achilles.py:190-200`): what Atlas/Ares join analysis ids against.
    */
  def analysisCatalog(s: SparkSession): DataFrame = {
    import s.implicits._
    Catalog.map(a => (a.id, a.name,
        Option(a.stratum1).filter(_.nonEmpty),
        Option(a.stratum2).filter(_.nonEmpty),
        Option(a.stratum3).filter(_.nonEmpty),
        Option(a.stratum4).filter(_.nonEmpty),
        if (a.isDist) 1L else 0L))
      .toDF("analysis_id", "analysis_name", "stratum_1_name", "stratum_2_name",
        "stratum_3_name", "stratum_4_name", "distribution")
      .orderBy("analysis_id")
  }

  private def has(model: CdmModel, tb: String, cols: String*): Boolean =
    model.tables.contains(tb) && cols.forall(model.columns(tb).contains)

  /** Whether the model carries any core-battery table (guards callers
    * running over non-CDM models, where the battery would be empty).
    */
  def supports(model: CdmModel): Boolean =
    has(model, "person", "person_id") ||
      has(model, "observation_period", "person_id",
        "observation_period_start_date", "observation_period_end_date") ||
      DomainSeries.exists(d => has(model, d.table, d.concept)) ||
      has(model, "cost", "cost_domain_id", "cost_event_id")

  /** The six CDM 5.x cost amount columns the 1502-1507/1602-1607 dist
    * families read, ordered so `analysis id = block base + index + 2`.
    */
  val CostAmounts: Seq[String] = Seq(
    "paid_patient_copay", "paid_patient_coinsurance", "paid_patient_deductible",
    "paid_by_payer", "paid_by_patient", "total_paid")

  /** Whether the model carries any core DIST analysis's tables. */
  def supportsDist(model: CdmModel): Boolean =
    (has(model, "person", "person_id", "year_of_birth") &&
      has(model, "observation_period", "person_id", "observation_period_start_date")) ||
      has(model, "observation_period", "person_id",
        "observation_period_start_date", "observation_period_end_date") ||
      DomainSeries.exists(d => d.perPersonDist && has(model, d.table, d.concept, "person_id")) ||
      has(model, "cost", ("cost_domain_id" +: "cost_event_id" +: CostAmounts): _*)

  /** The literal-id core COUNT battery over a CDM model: every analysis in
    * [[Catalog]] whose tables/columns the model carries, as one
    * map-side-combinable aggregate each, UNION ALL'd into the canonical
    * two-strata `achilles_results` shape (`stratum_2` NULL except for the
    * gender-by-age analysis 102) with small-cell suppression
    * (`achilles.py:27`; pass 0 to disable for tiny fixtures).
    */
  def cdmCoreResults(
      model: CdmModel,
      load: String => DataFrame,
      smallCellCount: Long = 5L,
      sourceName: String = "graft"): DataFrame = {
    val noS2 = lit(null).cast("string").as("stratum_2")
    def row(id: Long, stratum: org.apache.spark.sql.Column, df: DataFrame,
        agg: org.apache.spark.sql.Column): DataFrame =
      df.groupBy(stratum.cast("string").as("stratum_1"))
        .agg(agg.as("count_value"))
        .select(lit(id).as("analysis_id"), col("stratum_1"), noS2, col("count_value"))

    val person: Option[Seq[DataFrame]] =
      if (!has(model, "person", "person_id")) None
      else Some {
        val p = load("person")
        Seq(
          // 0: source name (`achilles.py` stores it as stratum_1, count 1)
          p.limit(1).agg(count(lit(1)).as("__one")).select(
            lit(0L).as("analysis_id"), lit(sourceName).as("stratum_1"), noS2,
            lit(1L).as("count_value")),
          p.agg(count(lit(1)).as("count_value"))
            .select(lit(1L).as("analysis_id"), lit("ALL").as("stratum_1"), noS2,
              col("count_value"))) ++
          Seq(("gender_concept_id", 2L), ("year_of_birth", 3L),
            ("race_concept_id", 4L), ("ethnicity_concept_id", 5L)).collect {
            case (c, id) if has(model, "person", c) => row(id, col(c), p, count(lit(1)))
          } ++
          // 10/12: the published two-strata person demographics
          Seq((10L, "year_of_birth", "gender_concept_id"),
              (12L, "race_concept_id", "ethnicity_concept_id")).collect {
            case (id, c1, c2) if has(model, "person", c1, c2) =>
              p.groupBy(col(c1).cast("string").as("stratum_1"),
                  col(c2).cast("string").as("stratum_2"))
                .agg(count(lit(1)).as("count_value"))
                .select(lit(id).as("analysis_id"), col("stratum_1"), col("stratum_2"),
                  col("count_value"))
          }
      }

    val obsPeriod: Option[Seq[DataFrame]] =
      if (!has(model, "observation_period", "person_id",
        "observation_period_start_date", "observation_period_end_date")) None
      else Some {
        val op = load("observation_period")
        val ageBase = Seq.newBuilder[DataFrame]
        ageBase ++= Seq(
          // 111/112: persons by start/end month (YYYYMM, the Achilles
          // calendar-month stratum encoding)
          row(111L, date_format(col("observation_period_start_date"), "yyyyMM"),
            op, countDistinct(col("person_id"))),
          row(112L, date_format(col("observation_period_end_date"), "yyyyMM"),
            op, countDistinct(col("person_id"))),
          // 113: persons by number of observation periods
          op.groupBy(col("person_id")).agg(count(lit(1)).as("__n"))
            .groupBy(col("__n").cast("string").as("stratum_1"))
            .agg(count(lit(1)).as("count_value"))
            .select(lit(113L).as("analysis_id"), col("stratum_1"), noS2, col("count_value"))) ++
        // 119: observation periods by period type concept (only when the
        // model carries the CDM 5.4 type column)
        (if (has(model, "observation_period", "period_type_concept_id"))
          Seq(row(119L, col("period_type_concept_id"), op, count(lit(1))))
        else Nil) ++ Seq(
          // 109: persons with CONTINUOUS observation in each year — a year
          // counts only when some period covers it whole. Candidate years
          // explode from the period's own span (bounded fan-out), the
          // cover predicate filters, persons dedup per year.
          op.select(col("person_id"),
              explode(sequence(year(col("observation_period_start_date")),
                year(col("observation_period_end_date")))).as("__y"),
              col("observation_period_start_date").as("__s"),
              col("observation_period_end_date").as("__e"))
            .filter(col("__s") <= to_date(concat(col("__y"), lit("-01-01"))) &&
              col("__e") >= to_date(concat(col("__y"), lit("-12-31"))))
            .groupBy(col("__y").cast("string").as("stratum_1"))
            .agg(countDistinct(col("person_id")).as("count_value"))
            .select(lit(109L).as("analysis_id"), col("stratum_1"), noS2, col("count_value")),
          // 115: persons with a period whose end precedes its start (the
          // Achilles data-quality count; zero rows under suppression when
          // the data is clean)
          op.filter(col("observation_period_end_date") < col("observation_period_start_date"))
            .agg(countDistinct(col("person_id")).as("count_value"))
            .select(lit(115L).as("analysis_id"), lit("ALL").as("stratum_1"), noS2,
              col("count_value")),
          // 108: persons by length of FIRST observation period in 30-day
          // increments (stratum = floor(days/30); first period = min-by
          // start date, matching dist analysis 105's choice of period)
          op.groupBy(col("person_id"))
            .agg(min(
              struct(col("observation_period_start_date"), col("observation_period_end_date")))
              .as("__p"))
            .select(floor(datediff(col("__p.observation_period_end_date"),
              col("__p.observation_period_start_date")) / 30).as("__len30"))
            .groupBy(col("__len30").cast("string").as("stratum_1"))
            .agg(count(lit(1)).as("count_value"))
            .select(lit(108L).as("analysis_id"), col("stratum_1"), noS2, col("count_value")))
        // 118: observation period records whose person_id resolves to no
        // person row (the x07 shape applied to the period table)
        if (has(model, "person", "person_id"))
          ageBase += op
            .join(load("person").select(col("person_id"), lit(1).as("__hp")),
              Seq("person_id"), "left")
            .agg(sum(when(col("__hp").isNull, 1L).otherwise(0L)).as("count_value"))
            .select(lit(118L).as("analysis_id"), lit("ALL").as("stratum_1"), noS2,
              col("count_value"))
        // 110/117: persons with continuous (110) / any (117) observation in
        // each month. The candidate-month explode is the battery's largest
        // intermediate (rows x months-of-span), so BOTH analyses share ONE
        // exploded aggregate — 110 is the conditional countDistinct under
        // the whole-month cover predicate, and the shared subtree plans a
        // single exchange (reused across the two union branches).
        val monthly = op.select(col("person_id"),
            explode(sequence(trunc(col("observation_period_start_date"), "MM"),
              trunc(col("observation_period_end_date"), "MM"),
              expr("interval 1 month"))).as("__m"),
            col("observation_period_start_date").as("__s"),
            col("observation_period_end_date").as("__e"))
          .groupBy(date_format(col("__m"), "yyyyMM").as("stratum_1"))
          .agg(
            countDistinct(when(
              col("__s") <= col("__m") && col("__e") >= last_day(col("__m")),
              col("person_id"))).as("__n110"),
            countDistinct(col("person_id")).as("__n117"))
        ageBase += monthly.select(lit(110L).as("analysis_id"), col("stratum_1"), noS2,
          col("__n110").as("count_value"))
        ageBase += monthly.select(lit(117L).as("analysis_id"), col("stratum_1"), noS2,
          col("__n117").as("count_value"))
        // 101/102: persons by age (and by gender by age) at FIRST
        // observation period — one shuffle on person_id, then tiny strata
        if (has(model, "person", "year_of_birth")) {
          // 114: persons with ANY observation period starting before their
          // year of birth (data-quality count, 'ALL' stratum)
          ageBase += op
            .join(load("person").select(col("person_id"), col("year_of_birth")), "person_id")
            .filter(year(col("observation_period_start_date")) < col("year_of_birth"))
            .agg(countDistinct(col("person_id")).as("count_value"))
            .select(lit(114L).as("analysis_id"), lit("ALL").as("stratum_1"), noS2,
              col("count_value"))
          val age = op.groupBy(col("person_id"))
            .agg(min(col("observation_period_start_date")).as("__first"))
            .join(load("person").select(
              col("person_id"), col("year_of_birth"),
              if (has(model, "person", "gender_concept_id")) col("gender_concept_id")
              else lit(null).cast("long").as("gender_concept_id")), "person_id")
            .select(col("person_id"), col("gender_concept_id"),
              (year(col("__first")) - col("year_of_birth")).as("__age"))
          ageBase += row(101L, col("__age"), age, count(lit(1)))
          if (has(model, "person", "gender_concept_id"))
            ageBase += age
              .groupBy(col("gender_concept_id").cast("string").as("stratum_1"),
                col("__age").cast("string").as("stratum_2"))
              .agg(count(lit(1)).as("count_value"))
              .select(lit(102L).as("analysis_id"), col("stratum_1"), col("stratum_2"),
                col("count_value"))
        }
        ageBase.result()
      }

    // Each domain table fuses into TWO grouping-sets passes (one scan +
    // one exchange each) — every additional analysis rides an existing
    // pass instead of adding a scan:
    //   records pass  — x01 (concept), x05 (concept, type), x20 (month)
    //                   under count(*), PLUS the per-record validity
    //                   counts x07 (person exists) / x08 (covered by an
    //                   observation period) / x09 (end before start) as
    //                   conditional sums under the EMPTY grouping set;
    //   persons pass  — x00 (concept), x02 (concept, month), and the
    //                   four-strata Atlas drill-down x04 (concept, year,
    //                   gender, age decile) under countDistinct(person).
    // grouping_id() keys each output row back to its analysis id. The
    // original standalone branches pre-filtered rows (null start dates,
    // the x04 inner person join dropping orphans); the fused passes drop
    // the corresponding OUTPUT groups instead (null month / null year /
    // null gender), which is aggregate-equivalent because the filtered
    // column is a group key. Periods aggregate to a small per-person
    // array (bounded by CDM semantics), so the x08 cover test is an
    // intra-row array scan and a record covered by two periods counts
    // once; the person-flag / period-array / person-attribute joins all
    // broadcast at report scale.
    val hasAttrs = has(model, "person", "person_id", "year_of_birth", "gender_concept_id")
    val domainParts: Seq[(Seq[DataFrame], Seq[DataFrame])] = DomainSeries.collect {
      case d if has(model, d.table, d.concept) && model.columns(d.table).contains("person_id") =>
        val df = load(d.table)
        val hasStart = has(model, d.table, d.startDate)
        val typeOpt = d.typeCol.filter(tc => has(model, d.table, tc))
        val nullS = lit(null).cast("string")

        // ---- records + validity pass ----
        // era tables carry the same three validity checks, shifted one id
        // (x07 is their era-length dist): person fk at x08, observation
        // coverage at x09, end-before-start at x10 — public Achilles
        // convention, same fused single scan either way
        val validityTable = OccurrenceTables(d.table) || EraTables(d.table)
        val slotShift = if (EraTables(d.table)) 1L else 0L
        val wantX07 = validityTable && has(model, "person", "person_id")
        val wantX08 = validityTable && hasStart &&
          has(model, "observation_period", "person_id",
            "observation_period_start_date", "observation_period_end_date")
        val endOpt = d.endDate.filter(e =>
          validityTable && has(model, d.table, e, d.startDate))
        // 210/2510: the visit-table care-site fk-validity counts (r15) —
        // ride the same fused scan as the person/period checks (the x10
        // slot is free here; the era tables use it for end-before-start)
        val wantCs = Set("visit_occurrence", "visit_detail")(d.table) &&
          has(model, d.table, "care_site_id") &&
          has(model, "care_site", "care_site_id")
        var enriched = df
        if (wantX07)
          enriched = enriched.join(
            load("person").select(col("person_id"), lit(1).as("__hasp")),
            Seq("person_id"), "left")
        if (wantX08)
          enriched = enriched.join(
            load("observation_period").groupBy(col("person_id"))
              .agg(collect_list(struct(
                col("observation_period_start_date").as("s"),
                col("observation_period_end_date").as("e"))).as("__ops")),
            Seq("person_id"), "left")
        if (wantCs)
          enriched = enriched.join(
            broadcast(load("care_site").select(col("care_site_id")).distinct()
              .withColumn("__hacs", lit(1))),
            Seq("care_site_id"), "left")
        val checks = Seq.newBuilder[(Long, org.apache.spark.sql.Column)]
        if (wantX07) checks += ((d.base + 7 + slotShift, col("__hasp").isNull))
        if (wantX08) checks += ((d.base + 8 + slotShift, col("__ops").isNull ||
          !exists(col("__ops"), o => col(d.startDate) >= o.getField("s") &&
            col(d.startDate) <= o.getField("e"))))
        endOpt.foreach(e => checks += ((d.base + 9 + slotShift, col(e) < col(d.startDate))))
        if (wantCs) checks += ((d.base + 10,
          col("care_site_id").isNotNull && col("__hacs").isNull))
        val cs = checks.result()
        val recBase = enriched.select(Seq(
          col(d.concept).cast("string").as("__c"),
          (if (hasStart) date_format(col(d.startDate), "yyyyMM") else nullS).as("__m"),
          typeOpt.map(tc => col(tc).cast("string")).getOrElse(nullS).as("__t")) ++
          cs.zipWithIndex.map { case ((_, p), i) => p.as(s"__v$i") }: _*)
        // gid bits over (c, m, t): set (c) -> 3, (c, t) -> 2, (m) -> 5,
        // () -> 7 (the validity row)
        val recordSets = Seq(Seq(col("__c"))) ++
          typeOpt.map(_ => Seq(col("__c"), col("__t"))).toSeq ++
          (if (hasStart && (OccurrenceTables(d.table) || EraTables(d.table)))
            Seq(Seq(col("__m"))) else Nil) ++
          (if (cs.nonEmpty) Seq(Seq.empty[org.apache.spark.sql.Column]) else Nil)
        val recAggs = count(lit(1)).as("count_value") +: grouping_id().as("__gid") +:
          cs.zipWithIndex.map { case (_, i) =>
            sum(when(col(s"__v$i"), 1L).otherwise(0L)).as(s"__s$i") }
        val recAgg = recBase
          .groupingSets(recordSets, col("__c"), col("__m"), col("__t"))
          .agg(recAggs.head, recAggs.tail: _*)
          .filter(!(col("__gid") === 5 && col("__m").isNull))
        val recRow = struct(
          when(col("__gid") === 3, lit(d.base + 1))
            .when(col("__gid") === 2, lit(d.base + 5))
            .otherwise(lit(d.base + 20)).as("analysis_id"),
          when(col("__gid") === 5, col("__m")).otherwise(col("__c")).as("stratum_1"),
          when(col("__gid") === 2, col("__t")).otherwise(nullS).as("stratum_2"),
          col("count_value").as("count_value"))
        val records =
          if (cs.isEmpty)
            recAgg.select(col("__gid"), recRow.as("__r"))
              .select(col("__r.analysis_id").as("analysis_id"),
                col("__r.stratum_1").as("stratum_1"),
                col("__r.stratum_2").as("stratum_2"),
                col("__r.count_value").as("count_value"))
          else {
            val valStructs = cs.zipWithIndex.map { case ((id, _), i) =>
              struct(lit(id).as("analysis_id"), lit("ALL").as("stratum_1"),
                nullS.as("stratum_2"), col(s"__s$i").as("count_value")) }
            recAgg.select(explode(
                when(col("__gid") === 7, array(valStructs: _*))
                  .otherwise(array(recRow))).as("__r"))
              .select(col("__r.analysis_id").as("analysis_id"),
                col("__r.stratum_1").as("stratum_1"),
                col("__r.stratum_2").as("stratum_2"),
                col("__r.count_value").as("count_value"))
          }

        // ---- persons (+ x04 drill-down) pass ----
        val wantX04 = hasAttrs && d.table != "death" && hasStart
        val pIn =
          if (wantX04) df.join(load("person").select(
            col("person_id"), col("year_of_birth"), col("gender_concept_id")),
            Seq("person_id"), "left")
          else df
        val pBase = pIn.select(
          col(d.concept).cast("string").as("__c"),
          (if (hasStart) date_format(col(d.startDate), "yyyyMM") else nullS).as("__m"),
          (if (wantX04) year(col(d.startDate)).cast("string") else nullS).as("__y"),
          (if (wantX04) col("gender_concept_id").cast("string") else nullS).as("__g2"),
          (if (wantX04) floor((year(col(d.startDate)) - col("year_of_birth")) / 10)
            .cast("string") else nullS).as("__dec"),
          col("person_id").as("__p"))
        // gid bits over (c, m, y, g2, dec): set (c) -> 15, (c, m) -> 7,
        // (c, y, g2, dec) -> 8, and for the visit series the concept-free
        // published density drill-down 212 (visit_detail convention
        // sibling 2512) rides the SAME pass as set (y, g2, dec) -> 24
        // (c and m aggregated: 16 + 8)
        val want212 = wantX04 && Set(200L, 2500L)(d.base)
        val personSets = Seq(Seq(col("__c"))) ++
          (if (hasStart) Seq(Seq(col("__c"), col("__m"))) else Nil) ++
          (if (wantX04)
            Seq(Seq(col("__c"), col("__y"), col("__g2"), col("__dec"))) else Nil) ++
          (if (want212)
            Seq(Seq(col("__y"), col("__g2"), col("__dec"))) else Nil)
        val persons = pBase
          .groupingSets(personSets,
            col("__c"), col("__m"), col("__y"), col("__g2"), col("__dec"))
          .agg(countDistinct(col("__p")).as("count_value"), grouping_id().as("__gid"))
          .filter(!(col("__gid") === 7 && col("__m").isNull))
          // the x04 inner-join equivalence: orphan records (no person row)
          // have null gender, rows with null start have null year — both
          // were dropped pre-agg in the unfused formulation and both are
          // group keys here, so dropping the output groups is identical
          .filter(!(col("__gid") === 8 && (col("__y").isNull || col("__g2").isNull)))
          .filter(!(col("__gid") === 24 && (col("__y").isNull || col("__g2").isNull)))
          .select(
            when(col("__gid") === 15, lit(d.base))
              .when(col("__gid") === 7, lit(d.base + 2))
              .when(col("__gid") === 24, lit(d.base + 12))
              .otherwise(lit(d.base + 4)).as("analysis_id"),
            when(col("__gid") === 24, col("__y")).otherwise(col("__c")).as("stratum_1"),
            when(col("__gid") === 7, col("__m"))
              .when(col("__gid") === 8, col("__y"))
              .when(col("__gid") === 24, col("__g2")).otherwise(nullS).as("stratum_2"),
            when(col("__gid") === 8, col("__g2"))
              .when(col("__gid") === 24, col("__dec")).otherwise(nullS).as("stratum_3"),
            when(col("__gid") === 8, col("__dec")).otherwise(nullS).as("stratum_4"),
            col("count_value"))
        (Seq(records), Seq(persons))
      case d if has(model, d.table, d.concept) =>
        (Seq(row(d.base + 1, col(d.concept), load(d.table), count(lit(1)))),
          Seq.empty[DataFrame])
    }
    val domains: Seq[DataFrame] = domainParts.flatMap(_._1)
    val domainsWide: Seq[DataFrame] = domainParts.flatMap(_._2)

    // 116: persons with at least one observed day in each YEAR, by gender
    // and age decile — the three-strata sibling of 117 (yearly explode,
    // no cover predicate, person attributes joined in)
    val wide116: Seq[DataFrame] =
      if (!has(model, "observation_period", "person_id",
          "observation_period_start_date", "observation_period_end_date") ||
        !has(model, "person", "person_id", "year_of_birth", "gender_concept_id")) Nil
      else Seq(
        load("observation_period").select(col("person_id"),
            explode(sequence(year(col("observation_period_start_date")),
              year(col("observation_period_end_date")))).as("__y"))
          .join(load("person").select(
            col("person_id"), col("year_of_birth"), col("gender_concept_id")), "person_id")
          .groupBy(col("__y").cast("string").as("stratum_1"),
            col("gender_concept_id").cast("string").as("stratum_2"),
            floor((col("__y") - col("year_of_birth")) / 10).cast("string").as("stratum_3"))
          .agg(countDistinct(col("person_id")).as("count_value"))
          .select(lit(116L).as("analysis_id"), col("stratum_1"), col("stratum_2"),
            col("stratum_3"), lit(null).cast("string").as("stratum_4"), col("count_value")))

    // 1500/1600: cost rows whose event id resolves to no row of the
    // domain's event table (the fk-validity counts of the published cost
    // id blocks) — one left-anti join per domain on the event key
    val costCounts: Seq[DataFrame] =
      if (!has(model, "cost", "cost_domain_id", "cost_event_id")) Nil
      else {
        val c = load("cost")
        Seq(("Drug", "drug_exposure", "drug_exposure_id", 1500L),
            ("Procedure", "procedure_occurrence", "procedure_occurrence_id", 1600L))
          .collect {
            case (dom, tb, idc, aid) if has(model, tb, idc) =>
              c.filter(col("cost_domain_id") === dom)
                .join(load(tb).select(col(idc).as("cost_event_id")),
                  Seq("cost_event_id"), "left_anti")
                .agg(count(lit(1)).as("count_value"))
                .select(lit(aid).as("analysis_id"), lit("ALL").as("stratum_1"), noS2,
                  col("count_value"))
          } ++
          // 1501/1601: the cost blocks' payer-plan-period fk-validity slot
          // (r15) — same left-anti shape on the period key
          (if (!has(model, "cost", "payer_plan_period_id") ||
            !has(model, "payer_plan_period", "payer_plan_period_id")) Nil
          else Seq(("Drug", 1501L), ("Procedure", 1601L)).map { case (dom, aid) =>
            c.filter(col("cost_domain_id") === dom &&
                col("payer_plan_period_id").isNotNull)
              .join(load("payer_plan_period").select(col("payer_plan_period_id")),
                Seq("payer_plan_period_id"), "left_anti")
              .agg(count(lit(1)).as("count_value"))
              .select(lit(aid).as("analysis_id"), lit("ALL").as("stratum_1"), noS2,
                col("count_value"))
          }) ++
          // 1610: procedure cost records by revenue code (r15)
          (if (!has(model, "cost", "revenue_code_concept_id")) Nil
          else Seq(row(1610L, col("revenue_code_concept_id"),
            c.filter(col("cost_domain_id") === "Procedure"), count(lit(1)))))
      }

    // ---- the care-network tier ----
    def unpack(df: DataFrame): DataFrame =
      df.select(col("__r.analysis_id").as("analysis_id"),
        col("__r.stratum_1").as("stratum_1"),
        col("__r.stratum_2").as("stratum_2"),
        col("__r.count_value").as("count_value"))
    val nullS2 = lit(null).cast("string").as("stratum_2")

    // 7/8/9: persons whose care-network fk doesn't resolve — ONE person
    // scan, the three reference id sets broadcast-joined, the three
    // conditional sums exploded from a single global row
    val personFks: Seq[DataFrame] = {
      val fks = Seq(
        (7L, "provider_id", "provider"),
        (8L, "location_id", "location"),
        (9L, "care_site_id", "care_site"))
        .filter { case (_, c, tb) => has(model, "person", c) && has(model, tb, c) }
      if (fks.isEmpty) Nil
      else {
        var pj = load("person").select(col("person_id") +: fks.map(f => col(f._2)): _*)
        fks.zipWithIndex.foreach { case ((_, c, tb), i) =>
          pj = pj.join(
            broadcast(load(tb).select(col(c)).distinct().withColumn(s"__h$i", lit(1))),
            Seq(c), "left")
        }
        val sums = fks.zipWithIndex.map { case ((_, c, _), i) =>
          sum(when(col(c).isNotNull && col(s"__h$i").isNull, 1L).otherwise(0L)).as(s"__s$i") }
        val structs = fks.zipWithIndex.map { case ((id, _, _), i) =>
          struct(lit(id).as("analysis_id"), lit("ALL").as("stratum_1"),
            lit(null).cast("string").as("stratum_2"), col(s"__s$i").as("count_value")) }
        Seq(unpack(pj.agg(sums.head, sums.tail: _*)
          .select(explode(array(structs: _*)).as("__r"))))
      }
    }

    // 300/301 provider, 1100-1103 location, 1200-1202 place of service —
    // aggregates over the (small) care-network dimensions; the location /
    // care-site joins broadcast the dimension into the person/visit scan
    val network = Seq.newBuilder[DataFrame]
    if (has(model, "provider", "provider_id")) {
      val pr = load("provider")
      network += pr.agg(count(lit(1)).as("count_value"))
        .select(lit(300L).as("analysis_id"), lit("ALL").as("stratum_1"), nullS2,
          col("count_value"))
      if (has(model, "provider", "specialty_concept_id"))
        network += row(301L, col("specialty_concept_id"), pr, count(lit(1)))
    }
    if (has(model, "location", "location_id", "zip", "state")) {
      val locb = broadcast(load("location"))
      if (has(model, "person", "location_id")) {
        val pl = load("person").join(locb, "location_id")
        network += row(1100L, substring(col("zip"), 1, 3), pl, count(lit(1)))
        network += row(1101L, col("state"), pl, count(lit(1)))
      }
      if (has(model, "care_site", "care_site_id", "location_id")) {
        val cl = load("care_site").join(locb, "location_id")
        network += row(1102L, substring(col("zip"), 1, 3), cl, count(lit(1)))
        network += row(1103L, col("state"), cl, count(lit(1)))
      }
    }
    if (has(model, "care_site", "care_site_id", "place_of_service_concept_id")) {
      val cs = load("care_site")
      if (has(model, "person", "care_site_id"))
        network += row(1200L, col("place_of_service_concept_id"),
          load("person").join(broadcast(cs), "care_site_id"), count(lit(1)))
      if (has(model, "visit_occurrence", "care_site_id"))
        network += row(1201L, col("place_of_service_concept_id"),
          load("visit_occurrence").join(broadcast(cs), "care_site_id"), count(lit(1)))
      network += row(1202L, col("place_of_service_concept_id"), cs, count(lit(1)))
    }

    // 1408-1413: the payer-coverage analyses (the published 1400 block
    // mirrors the observation-period sub-ids at +1300) — same shapes as
    // 108/109/111/112/113 over payer_plan_period
    val payer: Option[Seq[DataFrame]] =
      if (!has(model, "payer_plan_period", "person_id",
        "payer_plan_period_start_date", "payer_plan_period_end_date")) None
      else Some {
        val pp = load("payer_plan_period")
        // 1400/1401/1402: the payer_source_value series — persons and
        // records by payer, persons by start month by payer (the x00/x01/
        // x02 shapes with the source value as the "concept"). 1400 and
        // 1401 share ONE scan+aggregate (the 1700/1701 pattern: both
        // aggregates in the same groupBy, two rows exploded per payer);
        // 1402's (payer, month) countDistinct is its own granularity and
        // cannot roll up from the fused pass.
        (if (has(model, "payer_plan_period", "payer_source_value")) Seq(
          unpack(pp
            .groupBy(col("payer_source_value").cast("string").as("stratum_1"))
            .agg(countDistinct(col("person_id")).as("__per"),
              count(lit(1)).as("__rec"))
            .select(explode(array(
              struct(lit(1400L).as("analysis_id"), col("stratum_1"),
                lit(null).cast("string").as("stratum_2"), col("__per").as("count_value")),
              struct(lit(1401L).as("analysis_id"), col("stratum_1"),
                lit(null).cast("string").as("stratum_2"), col("__rec").as("count_value"))))
              .as("__r"))),
          pp.groupBy(col("payer_source_value").cast("string").as("stratum_1"),
              date_format(col("payer_plan_period_start_date"), "yyyyMM").as("stratum_2"))
            .agg(countDistinct(col("person_id")).as("count_value"))
            .select(lit(1402L).as("analysis_id"), col("stratum_1"), col("stratum_2"),
              col("count_value")))
        else Nil) ++ Seq(
          row(1411L, date_format(col("payer_plan_period_start_date"), "yyyyMM"),
            pp, countDistinct(col("person_id"))),
          row(1412L, date_format(col("payer_plan_period_end_date"), "yyyyMM"),
            pp, countDistinct(col("person_id"))),
          pp.groupBy(col("person_id")).agg(count(lit(1)).as("__n"))
            .groupBy(col("__n").cast("string").as("stratum_1"))
            .agg(count(lit(1)).as("count_value"))
            .select(lit(1413L).as("analysis_id"), col("stratum_1"), nullS2,
              col("count_value")),
          pp.groupBy(col("person_id"))
            .agg(min(struct(col("payer_plan_period_start_date"),
                col("payer_plan_period_end_date"))).as("__p"))
            .select(floor(datediff(col("__p.payer_plan_period_end_date"),
              col("__p.payer_plan_period_start_date")) / 30).as("__len30"))
            .groupBy(col("__len30").cast("string").as("stratum_1"))
            .agg(count(lit(1)).as("count_value"))
            .select(lit(1408L).as("analysis_id"), col("stratum_1"), nullS2,
              col("count_value")),
          pp.select(col("person_id"),
              explode(sequence(year(col("payer_plan_period_start_date")),
                year(col("payer_plan_period_end_date")))).as("__y"),
              col("payer_plan_period_start_date").as("__s"),
              col("payer_plan_period_end_date").as("__e"))
            .filter(col("__s") <= to_date(concat(col("__y"), lit("-01-01"))) &&
              col("__e") >= to_date(concat(col("__y"), lit("-12-31"))))
            .groupBy(col("__y").cast("string").as("stratum_1"))
            .agg(countDistinct(col("person_id")).as("count_value"))
            .select(lit(1409L).as("analysis_id"), col("stratum_1"), nullS2,
              col("count_value")),
          // 1410/1417: continuous (1410) / any (1417) coverage in each
          // month — the 110/117 mirrors, sharing ONE month explode and
          // one aggregate exactly like the observation-period pair
          {
            val monthlyPp = pp.select(col("person_id"),
                explode(sequence(trunc(col("payer_plan_period_start_date"), "MM"),
                  trunc(col("payer_plan_period_end_date"), "MM"),
                  expr("interval 1 month"))).as("__m"),
                col("payer_plan_period_start_date").as("__s"),
                col("payer_plan_period_end_date").as("__e"))
              .groupBy(date_format(col("__m"), "yyyyMM").as("stratum_1"))
              .agg(
                countDistinct(when(
                  col("__s") <= col("__m") && col("__e") >= last_day(col("__m")),
                  col("person_id"))).as("__n1410"),
                countDistinct(col("person_id")).as("__n1417"))
            unpack(monthlyPp.select(explode(array(
              struct(lit(1410L).as("analysis_id"), col("stratum_1"),
                lit(null).cast("string").as("stratum_2"),
                col("__n1410").as("count_value")),
              struct(lit(1417L).as("analysis_id"), col("stratum_1"),
                lit(null).cast("string").as("stratum_2"),
                col("__n1417").as("count_value")))).as("__r")))
          },
          // 1415: persons with a period whose end precedes its start (the
          // 115 mirror)
          pp.filter(col("payer_plan_period_end_date") <
              col("payer_plan_period_start_date"))
            .agg(countDistinct(col("person_id")).as("count_value"))
            .select(lit(1415L).as("analysis_id"), lit("ALL").as("stratum_1"),
              nullS2, col("count_value"))) ++
        // 1414/1418: the 114/118 mirrors (person-joined checks)
        (if (!has(model, "person", "person_id")) Nil
        else {
          val inval = pp
            .join(load("person").select(col("person_id"), lit(1).as("__hp")),
              Seq("person_id"), "left")
            .agg(sum(when(col("__hp").isNull, 1L).otherwise(0L)).as("count_value"))
            .select(lit(1418L).as("analysis_id"), lit("ALL").as("stratum_1"),
              nullS2, col("count_value"))
          val before =
            if (!has(model, "person", "year_of_birth")) Nil
            else Seq(pp
              .join(load("person").select(col("person_id"), col("year_of_birth")),
                "person_id")
              .filter(year(col("payer_plan_period_start_date")) < col("year_of_birth"))
              .agg(countDistinct(col("person_id")).as("count_value"))
              .select(lit(1414L).as("analysis_id"), lit("ALL").as("stratum_1"),
                nullS2, col("count_value")))
          inval +: before
        })
      }

    // 1700/1701: cohort records + distinct subjects — ONE scan, both
    // aggregates in the same groupBy, two rows exploded per cohort
    val cohortRows: Seq[DataFrame] =
      if (!has(model, "cohort", "cohort_definition_id", "subject_id")) Nil
      else Seq(unpack(load("cohort")
        .groupBy(col("cohort_definition_id").cast("string").as("stratum_1"))
        .agg(count(lit(1)).as("__rec"), countDistinct(col("subject_id")).as("__subj"))
        .select(explode(array(
          struct(lit(1700L).as("analysis_id"), col("stratum_1"),
            lit(null).cast("string").as("stratum_2"), col("__rec").as("count_value")),
          struct(lit(1701L).as("analysis_id"), col("stratum_1"),
            lit(null).cast("string").as("stratum_2"), col("__subj").as("count_value"))))
          .as("__r"))))

    // 1814/1818/1819: measurement value checks — no value at all, value
    // below the low range, value above the high range — fused into ONE
    // measurement scan (three conditional sums, rows exploded from the
    // single global row)
    val measNoValue: Seq[DataFrame] =
      if (!has(model, "measurement", "value_as_number", "value_as_concept_id")) Nil
      else {
        val hasRange = has(model, "measurement", "range_low", "range_high")
        val sums = Seq(
          sum(when(col("value_as_number").isNull && col("value_as_concept_id").isNull,
            1L).otherwise(0L)).as("__s14"),
          // 1821: no NUMERIC value (value_as_concept may still be set) —
          // the published sibling of 1814
          sum(when(col("value_as_number").isNull, 1L).otherwise(0L)).as("__s21")) ++
          (if (hasRange) Seq(
            sum(when(col("value_as_number") < col("range_low"), 1L).otherwise(0L))
              .as("__s18"),
            sum(when(col("value_as_number") > col("range_high"), 1L).otherwise(0L))
              .as("__s19"))
          else Nil)
        val structs = (Seq(1814L -> "__s14", 1821L -> "__s21") ++
          (if (hasRange) Seq(1818L -> "__s18", 1819L -> "__s19") else Nil))
          .map { case (id, c) =>
            struct(lit(id).as("analysis_id"), lit("ALL").as("stratum_1"),
              lit(null).cast("string").as("stratum_2"), col(c).as("count_value")) }
        Seq(unpack(load("measurement").agg(sums.head, sums.tail: _*)
          .select(explode(array(structs: _*)).as("__r"))))
      }

    // 2000/2001/2002/2004: persons present in multiple domains — ONE union
    // of the event domains' person ids (published 2004 order: condition,
    // drug, device, measurement, death, procedure, observation) and ONE
    // person-keyed flag aggregate (map-side combine collapses the raw fact
    // ids before the shuffle). The three treemap intersections (2000-2002)
    // fall out of a single global row over the flags; the domain-overlap
    // profile 2004 (Ares' upset chart) groups the SAME flags into a
    // presence bitmask — absent tables hold position as '0' so the mask
    // stays 7 characters on any model.
    val coocc: Seq[DataFrame] = {
      val overlapOrder = Seq("condition_occurrence" -> 0, "drug_exposure" -> 1,
        "device_exposure" -> 2, "measurement" -> 3, "death" -> 4,
        "procedure_occurrence" -> 5, "observation" -> 6)
      val avail = overlapOrder.filter { case (tb, _) =>
        has(model, tb) && model.columns(tb).contains("person_id") }
      if (avail.isEmpty) Nil
      else {
        val tagged = avail.map { case (tb, i) =>
          load(tb).select(col("person_id"), lit(i).as("__src")) }
          .reduce(_ unionByName _)
        val flagCols = overlapOrder.map { case (_, i) =>
          max(when(col("__src") === i, 1L).otherwise(0L)).as(s"__f$i") }
        val flags = tagged.groupBy(col("person_id"))
          .agg(flagCols.head, flagCols.tail: _*)
        val mask = flags
          .groupBy(concat(overlapOrder.map { case (_, i) =>
            col(s"__f$i").cast("string") }: _*).as("stratum_1"))
          .agg(count(lit(1)).as("count_value"))
          .select(lit(2004L).as("analysis_id"), col("stratum_1"), nullS2,
            col("count_value"))
        val treemap =
          if (!Seq("condition_occurrence", "drug_exposure", "procedure_occurrence",
            "measurement").forall(tb => avail.exists(_._1 == tb))) Nil
          else Seq(unpack(flags.agg(
              sum(col("__f0") * col("__f1")).as("__s0"),
              sum(col("__f0") * col("__f5")).as("__s1"),
              sum(col("__f3") * col("__f0") * col("__f1")).as("__s2"),
              sum(col("__f3") * col("__f1")).as("__s3"))
            .select(explode(array(
              struct(lit(2000L).as("analysis_id"), lit("ALL").as("stratum_1"),
                lit(null).cast("string").as("stratum_2"), col("__s0").as("count_value")),
              struct(lit(2001L).as("analysis_id"), lit("ALL").as("stratum_1"),
                lit(null).cast("string").as("stratum_2"), col("__s1").as("count_value")),
              struct(lit(2002L).as("analysis_id"), lit("ALL").as("stratum_1"),
                lit(null).cast("string").as("stratum_2"), col("__s2").as("count_value")),
              struct(lit(2003L).as("analysis_id"), lit("ALL").as("stratum_1"),
                lit(null).cast("string").as("stratum_2"), col("__s3").as("count_value"))))
              .as("__r"))))
        mask +: treemap
      }
    }

    // 505: death records by type concept (the death series carries no x05
    // slot in DomainSeries — its type analysis is this standalone id)
    val deathType: Seq[DataFrame] =
      if (!has(model, "death", "death_type_concept_id")) Nil
      else Seq(row(505L, col("death_type_concept_id"), load("death"), count(lit(1))))

    // 509/510: the published death data-quality counts — death records
    // with an invalid person_id, and death records outside any of the
    // person's observation periods (anti-join / exists over the bounded
    // per-person period list, same shape as the x07/x08 families)
    val deathDq: Seq[DataFrame] = {
      val inval =
        if (!has(model, "death", "person_id") || !has(model, "person", "person_id")) Nil
        else Seq(load("death")
          .join(load("person").select(col("person_id")), Seq("person_id"), "left_anti")
          .agg(count(lit(1)).as("count_value"))
          .select(lit(509L).as("analysis_id"), lit("ALL").as("stratum_1"), nullS2,
            col("count_value")))
      val outside =
        if (!has(model, "death", "person_id", "death_date") ||
          !has(model, "observation_period", "person_id",
            "observation_period_start_date", "observation_period_end_date")) Nil
        else {
          val ops = load("observation_period")
            .groupBy(col("person_id"))
            .agg(collect_list(struct(
              col("observation_period_start_date").as("s"),
              col("observation_period_end_date").as("e"))).as("__ops"))
          Seq(load("death").filter(col("death_date").isNotNull)
            .join(ops, Seq("person_id"), "left")
            .agg(sum(when(col("__ops").isNull ||
              !exists(col("__ops"), o => col("death_date") >= o.getField("s") &&
                col("death_date") <= o.getField("e")), 1L).otherwise(0L)).as("count_value"))
            .select(lit(510L).as("analysis_id"), lit("ALL").as("stratum_1"), nullS2,
              col("count_value")))
        }
      inval ++ outside
    }

    // 814: observation records carrying NO value at all (numeric or
    // concept) — the observation twin of measurement's 1814
    val obsNoValue: Seq[DataFrame] =
      if (!has(model, "observation", "value_as_number", "value_as_concept_id")) Nil
      else Seq(load("observation")
        .agg(sum(when(col("value_as_number").isNull && col("value_as_concept_id").isNull,
          1L).otherwise(0L)).as("count_value"))
        .select(lit(814L).as("analysis_id"), lit("ALL").as("stratum_1"), nullS2,
          col("count_value")))

    // 791/891/1891: persons with AT LEAST x records (the published
    // cumulative records-per-person series). Per-table: one shuffle to the
    // per-person count, one to the per-count histogram — bounded by the
    // maximum records-per-person at ANY data scale — then the cumulative
    // sum is a window over that bounded report, partitioned by analysis id
    // (never a global-order window over entity rows).
    val atLeastX: Seq[DataFrame] = {
      val specs = Seq(("visit_occurrence", 291L), ("condition_occurrence", 491L),
          ("procedure_occurrence", 691L), ("drug_exposure", 791L),
          ("observation", 891L), ("measurement", 1891L),
          ("device_exposure", 2191L), ("visit_detail", 2591L),
          ("drug_era", 991L), ("condition_era", 1091L), ("dose_era", 1391L),
          ("note", 2291L), ("specimen", 2491L))
        .filter { case (tb, _) => has(model, tb) &&
          model.columns(tb).contains("person_id") }
      if (specs.isEmpty) Nil
      else {
        val hist = specs.map { case (tb, id) =>
          load(tb).groupBy(col("person_id")).agg(count(lit(1)).as("__c"))
            .groupBy(col("__c")).agg(count(lit(1)).as("__n"))
            .select(lit(id).as("analysis_id"), col("__c"), col("__n"))
        }.reduce(_ unionByName _)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("analysis_id")).orderBy(col("__c").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        Seq(hist.select(col("analysis_id"),
          col("__c").cast("string").as("stratum_1"),
          lit(null).cast("string").as("stratum_2"),
          sum(col("__n")).over(w).as("count_value")))
      }
    }

    // (the note 2200/2201 rows ride the DomainSeries pass since r15 —
    // note is a full domain series now)

    val noS34 = Seq(lit(null).cast("string").as("stratum_3"),
      lit(null).cast("string").as("stratum_4"))
    val narrow = ((person.toSeq ++ obsPeriod.toSeq ++ payer.toSeq).flatten ++
      domains ++ costCounts ++ personFks ++ network.result() ++ cohortRows ++
      measNoValue ++ deathType ++ deathDq ++ obsNoValue ++ atLeastX ++ coocc)
      .pipe(graft.Unions.balanced)
      .select(Seq(col("analysis_id"), col("stratum_1"), col("stratum_2")) ++ noS34 :+
        col("count_value"): _*)
    (narrow +: (wide116 ++ domainsWide)).reduce(_ unionByName _)
      .filter(col("count_value") > smallCellCount || col("analysis_id") === 0L)
      .orderBy("analysis_id", "stratum_1", "stratum_2", "stratum_3", "stratum_4")
  }

  /** The literal-id core DIST battery (`achilles_results_dist` shape):
    * 103 age at first observation period, 105 length (days) of first
    * observation period, and the x03 family (203, 403, ... distinct
    * domain concepts per person) — each via the scale path
    * ([[AchillesGen.distAggFromValueCounts]]: moments + exact quantiles
    * over the value HISTOGRAM, so no rank window ever sees the entities).
    */
  def cdmCoreDistResults(model: CdmModel, load: String => DataFrame): DataFrame = {
    val noS2 = lit(null).cast("string").as("stratum_2")
    def hist(df: DataFrame, id: Long): DataFrame =
      df.groupBy(col("__v")).agg(count(lit(1)).as("__cnt"))
        .withColumn("analysis_id", lit(id))
        .withColumn("stratum_1", lit("ALL"))
        .withColumn("stratum_2", noS2)

    /** A stratified histogram: `(stratum expr, __v)` -> dist input rows. */
    def stratHist(df: DataFrame, id: Long, stratum: org.apache.spark.sql.Column): DataFrame =
      df.groupBy(stratum.cast("string").as("stratum_1"), col("__v"))
        .agg(count(lit(1)).as("__cnt"))
        .withColumn("analysis_id", lit(id))
        .withColumn("stratum_2", noS2)

    /** The two-strata histogram (1815's concept x unit). */
    def stratHist2(df: DataFrame, id: Long,
        s1: org.apache.spark.sql.Column, s2: org.apache.spark.sql.Column): DataFrame =
      df.groupBy(s1.cast("string").as("stratum_1"), s2.cast("string").as("stratum_2"),
          col("__v"))
        .agg(count(lit(1)).as("__cnt"))
        .withColumn("analysis_id", lit(id))

    val parts = Seq.newBuilder[DataFrame]
    val hasLen = has(model, "observation_period", "person_id",
      "observation_period_start_date", "observation_period_end_date")
    val hasAge = has(model, "person", "person_id", "year_of_birth") &&
      has(model, "observation_period", "person_id", "observation_period_start_date")
    if (hasAge || hasLen) {
      // ONE first-period frame (min-by start date) shared by the whole
      // 103..107 family: age at first period, its length in days, gender
      // and age-decile stratifications all derive from the same shuffle.
      val endCol =
        if (hasLen) col("observation_period_end_date")
        else lit(null).cast("date").as("observation_period_end_date")
      val firstP = load("observation_period")
        .select(col("person_id"), col("observation_period_start_date"), endCol)
        .groupBy(col("person_id"))
        .agg(min(
          struct(col("observation_period_start_date"), col("observation_period_end_date")))
          .as("__p"))
      val withGender = has(model, "person", "gender_concept_id")
      val enriched =
        if (!hasAge) firstP.select(col("person_id"),
          lit(null).cast("long").as("__g"), lit(null).cast("double").as("__age"),
          col("__p"))
        else load("person").select(
            col("person_id"), col("year_of_birth"),
            (if (withGender) col("gender_concept_id")
            else lit(null).cast("long")).as("__g"))
          .join(firstP, "person_id")
          .select(col("person_id"), col("__g"),
            (year(col("__p.observation_period_start_date")) - col("year_of_birth"))
              .cast("double").as("__age"),
            col("__p"))
      if (hasAge) {
        val age = enriched.select(col("__g"), col("__age").as("__v"))
        parts += hist(age.select(col("__v")), 103L)
        // 104: the same ages stratified by gender (stratum_1 = gender id)
        if (withGender) parts += stratHist(age, 104L, col("__g"))
      }
      if (hasLen) {
        val len = enriched.select(col("__g"), col("__age"),
          datediff(col("__p.observation_period_end_date"),
            col("__p.observation_period_start_date")).cast("double").as("__v"))
        parts += hist(len.select(col("__v")), 105L)
        // 106/107: first-period length by gender / by age decile at first
        // observation (public Achilles convention ids)
        if (withGender) parts += stratHist(len, 106L, col("__g"))
        if (hasAge) parts += stratHist(len, 107L, floor(col("__age") / 10).cast("long"))
      }
    }
    // x03: number of DISTINCT concepts per person (203 visit, 403
    // condition, ..., public Achilles convention) — one shuffle on
    // person_id per domain, then the value histogram is tiny
    DomainSeries.filter(d => d.perPersonDist &&
        has(model, d.table, d.concept, "person_id")).foreach { d =>
      val perPerson = load(d.table)
        .groupBy(col("person_id"))
        .agg(countDistinct(col(d.concept)).cast("double").as("__v"))
        .select(col("__v"))
      parts += hist(perPerson, d.base + 3)
    }
    // x93/x94: per-person density distributions (records per person, and
    // days between first and last record per person — graft convention
    // extensions, [[NonStandardIds]]). BOTH derive from ONE shuffle on
    // person_id per table (count + min/max date in the same aggregate);
    // the value histograms downstream are tiny at any scale.
    DomainSeries.filter(d => d.table != "death" &&
        has(model, d.table, "person_id", d.startDate)).foreach { d =>
      val perPerson = load(d.table)
        .groupBy(col("person_id"))
        .agg(count(lit(1)).cast("double").as("__v93"),
          datediff(to_date(max(col(d.startDate))), to_date(min(col(d.startDate))))
            .cast("double").as("__v94"))
      parts += hist(perPerson.select(col("__v93").as("__v")), d.base + 93)
      parts += hist(perPerson.filter(col("__v94").isNotNull)
        .select(col("__v94").as("__v")), d.base + 94)
    }
    // 1403: the payer sibling of the x03 family — distinct
    // payer_source_value values per person
    if (has(model, "payer_plan_period", "person_id", "payer_source_value"))
      parts += hist(load("payer_plan_period")
        .groupBy(col("person_id"))
        .agg(countDistinct(col("payer_source_value")).cast("double").as("__v"))
        .select(col("__v")), 1403L)
    // x06: distribution of age at FIRST occurrence by concept (206, 406,
    // ...) — one shuffle on (person, concept), birth years broadcast in
    val hasYob = has(model, "person", "person_id", "year_of_birth")
    if (hasYob) {
      val yob = load("person").select(col("person_id"), col("year_of_birth"))
      DomainSeries.filter(d => d.table != "death" &&
          has(model, d.table, d.concept, d.startDate, "person_id")).foreach { d =>
        val firstOcc = load(d.table)
          .filter(col(d.startDate).isNotNull)
          .groupBy(col("person_id"), col(d.concept))
          .agg(min(col(d.startDate)).as("__first"))
          .join(yob, "person_id")
          .select(col(d.concept),
            (year(col("__first")) - col("year_of_birth")).cast("double").as("__v"))
        parts += stratHist(firstOcc, d.base + 6, col(d.concept))
      }
      // 506: distribution of age at death, by gender
      if (has(model, "death", "person_id", "death_date") &&
          has(model, "person", "gender_concept_id")) {
        val atDeath = load("death")
          .filter(col("death_date").isNotNull)
          .join(load("person").select(col("person_id"), col("year_of_birth"),
            col("gender_concept_id")), "person_id")
          .select(col("gender_concept_id"),
            (year(col("death_date")) - col("year_of_birth")).cast("double").as("__v"))
        parts += stratHist(atDeath, 506L, col("gender_concept_id"))
      }
      // 1406/1407: length of the FIRST payer plan period, by gender / by
      // age decile at first payer plan (the payer twins of 106/107 —
      // published Achilles ids)
      if (has(model, "payer_plan_period", "person_id",
          "payer_plan_period_start_date", "payer_plan_period_end_date") &&
          has(model, "person", "gender_concept_id")) {
        val firstPp = load("payer_plan_period")
          .groupBy(col("person_id"))
          // min over struct(s, e): deterministic lexicographic tie-break —
          // min_by on the start date alone could take e from a different
          // tied row than the oracle (ADVICE r10)
          .agg(min(struct(
            col("payer_plan_period_start_date").as("s"),
            col("payer_plan_period_end_date").as("e"))).as("__p"))
          .join(load("person").select(col("person_id"), col("year_of_birth"),
            col("gender_concept_id")), "person_id")
          .select(col("gender_concept_id"),
            floor((year(col("__p.s")) - col("year_of_birth")) / 10).cast("long")
              .as("__dec"),
            datediff(col("__p.e"), col("__p.s")).cast("double").as("__v"))
        parts += stratHist(firstPp.select(col("gender_concept_id"), col("__v")),
          1406L, col("gender_concept_id"))
        parts += stratHist(firstPp.select(col("__dec"), col("__v")),
          1407L, col("__dec"))
      }
      // 504: distribution of age at death (the ungendered sibling of 506,
      // public Achilles id — r10 catalog growth)
      if (has(model, "death", "person_id", "death_date")) {
        val atDeath = load("death")
          .filter(col("death_date").isNotNull)
          .join(yob, "person_id")
          .select((year(col("death_date")) - col("year_of_birth"))
            .cast("double").as("__v"))
        parts += hist(atDeath, 504L)
      }
    }
    // 511-514: distribution of time (days) from death to the person's LAST
    // condition / drug / visit / procedure record (public Achilles ids;
    // negative values surface post-mortem records, exactly what the
    // published analyses exist to show). One map-side-combinable
    // groupBy-max per event table, joined to the bounded death set.
    if (has(model, "death", "person_id", "death_date")) {
      val death = load("death").filter(col("death_date").isNotNull)
        .select(col("person_id"), col("death_date"))
      Seq(
        (511L, "condition_occurrence", "condition_start_date"),
        (512L, "drug_exposure", "drug_exposure_start_date"),
        (513L, "visit_occurrence", "visit_start_date"),
        (514L, "procedure_occurrence", "procedure_date")
      ).foreach { case (id, tb, dateCol) =>
        if (has(model, tb, "person_id", dateCol)) {
          val lastEvt = load(tb).filter(col(dateCol).isNotNull)
            .groupBy(col("person_id")).agg(max(col(dateCol)).as("__last"))
          parts += hist(
            death.join(lastEvt, "person_id")
              .select(datediff(col("death_date"), col("__last"))
                .cast("double").as("__v")), id)
        }
      }
    }
    // 211 / 907 / 1007: duration distributions by concept (length of stay,
    // era lengths) — pure projections into a per-concept histogram
    DomainSeries.filter(d => d.endDate.isDefined &&
        DurationDists.contains(d.table)).foreach { d =>
      val end = d.endDate.get
      if (has(model, d.table, d.concept, d.startDate, end)) {
        val (id, _) = DurationDists(d.table)
        val dur = load(d.table)
          .filter(col(d.startDate).isNotNull && col(end).isNotNull)
          .select(col(d.concept),
            datediff(col(end), col(d.startDate)).cast("double").as("__v"))
        parts += stratHist(dur, id, col(d.concept))
      }
    }
    // 1815/1816/1817: numeric values and reference low/high ranges by
    // (concept, unit) — the two-strata family Ares' value-distribution
    // panels read. All available columns unpivot in ONE measurement scan
    // (analysis id = 1815 + column index; the null filter drops the
    // no-value rows from 1815 exactly as the standalone formulation did)
    if (has(model, "measurement", "measurement_concept_id", "unit_concept_id",
        "value_as_number")) {
      val valueCols = col("value_as_number") +:
        (if (has(model, "measurement", "range_low", "range_high"))
          Seq(col("range_low"), col("range_high"))
        else Nil)
      parts += load("measurement")
        .select(col("measurement_concept_id").cast("string").as("stratum_1"),
          col("unit_concept_id").cast("string").as("stratum_2"),
          posexplode(array(valueCols.map(_.cast("double")): _*)).as(Seq("__i", "__v")))
        .filter(col("__v").isNotNull)
        .groupBy((lit(1815L) + col("__i").cast("long")).as("analysis_id"),
          col("stratum_1"), col("stratum_2"), col("__v"))
        .agg(count(lit(1)).as("__cnt"))
    }
    // 715/716/717: the drug amount distributions (days_supply / refills /
    // quantity by drug_concept_id) — the three columns unpivot in ONE
    // drug_exposure scan (analysis id = 715 + column index, the same
    // posexplode pattern as measurement's 1815 family)
    if (has(model, "drug_exposure", "drug_concept_id", "days_supply",
        "refills", "quantity")) {
      parts += load("drug_exposure")
        .select(col("drug_concept_id").cast("string").as("stratum_1"),
          posexplode(array(col("days_supply").cast("double"),
            col("refills").cast("double"), col("quantity").cast("double")))
            .as(Seq("__i", "__v")))
        .filter(col("__v").isNotNull)
        .groupBy((lit(715L) + col("__i").cast("long")).as("analysis_id"),
          col("stratum_1"), col("__v"))
        .agg(count(lit(1)).as("__cnt"))
        .withColumn("stratum_2", noS2)
    }
    // 815: observation numeric values by (concept, unit) — the observation
    // twin of measurement's 1815
    if (has(model, "observation", "observation_concept_id", "unit_concept_id",
        "value_as_number")) {
      parts += stratHist2(
        load("observation")
          .filter(col("value_as_number").isNotNull)
          .select(col("observation_concept_id"), col("unit_concept_id"),
            col("value_as_number").cast("double").as("__v")),
        815L, col("observation_concept_id"), col("unit_concept_id"))
    }
    // 1502-1507 / 1602-1607: cost amount distributions by event concept —
    // one equi-join per domain (cost -> event table on the event id), the
    // six amount fields unpivoted in a single posexplode pass so the join
    // evaluates once (analysis id = block base + field index + 2)
    if (has(model, "cost", ("cost_domain_id" +: "cost_event_id" +: CostAmounts): _*)) {
      val c = load("cost")
      Seq(("Drug", "drug_exposure", "drug_exposure_id", "drug_concept_id", 1500L),
          ("Procedure", "procedure_occurrence", "procedure_occurrence_id",
            "procedure_concept_id", 1600L)).foreach {
        case (dom, tb, idc, cc, base) if has(model, tb, idc, cc) =>
          val joined = c.filter(col("cost_domain_id") === dom)
            .join(load(tb).select(col(idc).as("cost_event_id"), col(cc).as("__cc")),
              "cost_event_id")
          parts += joined
            .select(col("__cc").cast("string").as("stratum_1"),
              posexplode(array(CostAmounts.map(f => col(f).cast("double")): _*))
                .as(Seq("__i", "__v")))
            .groupBy((lit(base) + col("__i").cast("long") + lit(2L)).as("analysis_id"),
              col("stratum_1"), col("__v"))
            .agg(count(lit(1)).as("__cnt"))
            .withColumn("stratum_2", noS2)
        case _ => ()
      }
    }
    // 1509/1510/1511: the drug-cost money distributions beyond the shared
    // six (ingredient cost / dispensing fee / amount allowed) — the same
    // one-join one-posexplode shape as the 1502-1507 block (r15)
    if (has(model, "cost", "cost_domain_id", "cost_event_id",
        "paid_ingredient_cost", "paid_dispensing_fee", "amount_allowed") &&
      has(model, "drug_exposure", "drug_exposure_id", "drug_concept_id")) {
      parts += load("cost").filter(col("cost_domain_id") === "Drug")
        .join(load("drug_exposure").select(
          col("drug_exposure_id").as("cost_event_id"),
          col("drug_concept_id").as("__cc")), "cost_event_id")
        .select(col("__cc").cast("string").as("stratum_1"),
          posexplode(array(col("paid_ingredient_cost").cast("double"),
            col("paid_dispensing_fee").cast("double"),
            col("amount_allowed").cast("double"))).as(Seq("__i", "__v")))
        .filter(col("__v").isNotNull)
        .groupBy((lit(1509L) + col("__i").cast("long")).as("analysis_id"),
          col("stratum_1"), col("__v"))
        .agg(count(lit(1)).as("__cnt"))
        .withColumn("stratum_2", noS2)
    }
    val hists = parts.result()
    require(hists.nonEmpty, "model carries none of the core dist analyses")
    AchillesGen.distAggFromValueCounts(
      hists.reduce(_ unionByName _), Seq("analysis_id", "stratum_1", "stratum_2"))
      .orderBy("analysis_id", "stratum_1", "stratum_2")
  }

  /** The Achilles Heel tier: derived data-quality WARNING/ERROR rows
    * computed over the PERSISTED `achilles_results`(+`_dist`) report
    * tables — the published Achilles design runs its heel rules against
    * the results of the descriptive batteries, never against the facts,
    * so the whole tier costs O(|report|) at any data scale (the report is
    * bounded by |analyses| x |strata|, not by row count). The reference
    * ships the rule corpus inside the Achilles submodule
    * (`src/riab/libs/Achilles.md` — a stub in this checkout), so the rules
    * here re-express the PUBLIC heel conventions (invalid-fk counts must
    * be zero, date-order violations must be zero, unmapped-concept
    * percentage thresholds, implausible-age distribution bounds) with the
    * published message shape
    * `SEVERITY: {analysis_id} - {name}; count (n={x}) {rule text}` and the
    * output schema `achilles_heel_results(analysis_id,
    * achilles_heel_warning, rule_id, record_count)`.
    *
    * Rule definitions live HERE as data ([[Heel.countRules]],
    * [[Heel.distRules]]) and both the Spark side ([[heelResults]]) and the
    * generated DuckDB oracle iterate the same Seq — the two sides cannot
    * drift.
    */
  object Heel {
    /** A rule over the COUNT results: every analysis in `ids` present in
      * `achilles_results` fires one heel row with `record_count` = the
      * summed count_value.
      */
    final case class CountRule(ruleId: Long, severity: String, ids: Seq[Long], suffix: String)

    val countRules: Seq[CountRule] = Seq(
      // invalid-person family (occurrence x07, visit_detail 2507, era x08)
      // + the person 7/8/9 care-network fks + the 1500/1600 cost-event fks
      CountRule(1L, "ERROR",
        Seq(7L, 8L, 9L, 207L, 407L, 607L, 707L, 807L, 1807L, 2107L, 2507L,
          2207L, 2407L, 908L, 1008L, 1308L, 210L, 2510L, 1418L,
          1500L, 1600L, 1501L, 1601L),
        "should not be > 0 (invalid foreign key)"),
      // end-before-start family (occurrence x09, era x10) + 115
      // (observation period end < start)
      CountRule(2L, "ERROR",
        Seq(115L, 209L, 409L, 709L, 2109L, 2509L, 910L, 1010L, 1310L, 1415L),
        "should not be > 0 (end date precedes start date)"),
      // outside-observation-period family (occurrence x08, era x09)
      CountRule(3L, "WARNING",
        Seq(208L, 408L, 608L, 708L, 808L, 1808L, 2108L, 2508L,
          2208L, 2408L, 909L, 1009L, 1309L),
        "should not be > 0 (records outside a valid observation period)"),
      CountRule(4L, "WARNING", Seq(114L),
        "should not be > 0 (observation period before year of birth)"))

    /** Unmapped-concept rule: analyses whose stratum_1 is a concept id,
      * flagged when the `concept_id = 0` share exceeds the threshold.
      * Person 2/4/5 + the x01 records-by-concept family.
      */
    val UnmappedRuleId = 5L
    val UnmappedPctThreshold = 10L
    val UnmappedIds: Seq[Long] =
      Seq(2L, 4L, 5L, 201L, 401L, 501L, 601L, 701L, 801L, 901L, 1001L, 1801L, 2101L)
    val UnmappedSuffix = "unmapped (concept_id = 0) records exceed 10% of the analysis total"

    /** A rule over the DIST results: `record_count` = number of strata
      * violating the predicate; `ids = None` applies the rule to every
      * dist analysis (structural invariants). The predicate is carried as
      * SQL TEXT and `expr`-parsed on the Spark side — one string, two
      * engines, zero drift.
      */
    final case class DistRule(
        ruleId: Long, severity: String, ids: Option[Seq[Long]],
        predicate: String, suffix: String)

    val distRules: Seq[DistRule] = Seq(
      // age at first observation (103/104) + the x06 age-at-first family
      DistRule(6L, "WARNING",
        Some(Seq(103L, 104L, 206L, 406L, 606L, 706L, 806L, 906L, 1006L, 1806L,
          2106L, 2206L, 2406L, 2506L)),
        "max_value > 150", "strata carry an implausible maximum age (> 150)"),
      DistRule(7L, "WARNING", Some(Seq(506L)),
        "max_value > 120", "strata carry an implausible age at death (> 120)"),
      // structural invariant over every dist row
      DistRule(8L, "ERROR", None,
        "min_value > max_value", "strata violate min_value <= max_value"),
      // duration distributions must be non-negative (211 length of stay,
      // 907/1007 era lengths)
      DistRule(9L, "WARNING", Some(Seq(211L, 2511L, 907L, 1007L, 1307L)),
        "min_value < 0", "strata carry a negative duration"))
  }

  /** The concept hierarchy of the derived universe, as (ancestor,
    * descendant) pairs — the non-self rows of a CONCEPT_ANCESTOR closure.
    * In production the closure comes from the imported vocabulary (the S4
    * zip import path); the derived universe uses this vendored fixture so
    * the descendant rollup is exercised end-to-end: the four SNOMED
    * condition concepts roll up under 441840 ("Clinical finding") and the
    * three standard visit concepts under the Visit domain root 8.
    * Everything else rolls up through its self-row only.
    */
  val ConceptClosure: Seq[(Long, Long)] =
    Seq(201826L, 316866L, 4329847L, 255573L).map(441840L -> _) ++
      Seq(9201L, 9202L, 9203L).map(8L -> _)

  /** The `achilles_result_concept_count` table (the reference's
    * `--optimize-atlas-cache` flow, `achilles.py:628-660` — the literal
    * SQL lives in the stubbed Achilles submodule, so the published field
    * list/semantics are re-expressed): per-concept record and person
    * counts drawn from the x01/x00 domain-series results, plus
    * descendant-inclusive rollups through the CONCEPT_ANCESTOR closure
    * (self-rows implicit). Atlas reads this table instead of re-scanning
    * results per drill-down. Cost is O(|report| x |closure|) — the
    * bounded-report property the heel tier shares.
    */
  def resultConceptCounts(s: SparkSession, results: DataFrame): DataFrame = {
    val x00 = DomainSeries.map(_.base)
    val x01 = DomainSeries.map(_.base + 1)
    val base = results
      .filter(col("analysis_id").isin((x00 ++ x01).map(Long.box): _*))
      .groupBy(col("stratum_1").cast("long").as("concept_id"))
      .agg(
        sum(when(col("analysis_id").isin(x01.map(Long.box): _*), col("count_value"))
          .otherwise(0L)).as("record_count"),
        sum(when(col("analysis_id").isin(x00.map(Long.box): _*), col("count_value"))
          .otherwise(0L)).as("person_count"))
    val closure = base
      .select(col("concept_id").as("ancestor_id"), col("concept_id").as("descendant_id"))
      .unionByName {
        import s.implicits._
        ConceptClosure.toDF("ancestor_id", "descendant_id")
      }
    val descAgg = closure
      .join(base, col("descendant_id") === col("concept_id"))
      .groupBy("ancestor_id")
      .agg(sum("record_count").as("descendant_record_count"),
        sum("person_count").as("descendant_person_count"))
    descAgg
      .join(
        base.select(col("concept_id").as("__c"), col("record_count"), col("person_count")),
        col("ancestor_id") === col("__c"), "left")
      .select(col("ancestor_id").as("concept_id"),
        coalesce(col("record_count"), lit(0L)).as("record_count"),
        col("descendant_record_count"),
        coalesce(col("person_count"), lit(0L)).as("person_count"),
        col("descendant_person_count"))
  }

  /** Run the [[Heel]] rule corpus over materialized battery results.
    * `results` = `achilles_results` (analysis_id, stratum_1, stratum_2,
    * count_value); `dists` = `achilles_results_dist`. Output is the
    * public `achilles_heel_results` shape. Every rule is a groupBy over a
    * bounded report table joined to the broadcast catalog — no fact-table
    * scan anywhere in the tier.
    */
  def heelResults(s: SparkSession, results: DataFrame, dists: DataFrame): DataFrame = {
    val names = {
      import s.implicits._
      Catalog.map(a => (a.id, a.name)).toDF("analysis_id", "name")
    }
    def msg(severity: String, recordCount: org.apache.spark.sql.Column, suffix: String) =
      concat(lit(severity + ": "), col("analysis_id").cast("string"), lit(" - "),
        col("name"), lit("; count (n="), recordCount.cast("string"), lit(") " + suffix))
    def shape(df: DataFrame, severity: String, ruleId: Long, suffix: String) =
      df.join(broadcast(names), "analysis_id")
        .select(col("analysis_id"),
          msg(severity, col("record_count"), suffix).as("achilles_heel_warning"),
          lit(ruleId).as("rule_id"), col("record_count"))

    val fromCounts = Heel.countRules.map { r =>
      shape(
        results.filter(col("analysis_id").isin(r.ids: _*))
          .groupBy("analysis_id").agg(sum("count_value").as("record_count"))
          .filter(col("record_count") > 0),
        r.severity, r.ruleId, r.suffix)
    }
    val unmapped = shape(
      results.filter(col("analysis_id").isin(Heel.UnmappedIds: _*))
        .groupBy("analysis_id")
        .agg(sum("count_value").as("__total"),
          sum(when(col("stratum_1") === "0", col("count_value")).otherwise(0L))
            .as("record_count"))
        .filter(col("record_count") * 100 > col("__total") * Heel.UnmappedPctThreshold)
        .drop("__total"),
      "WARNING", Heel.UnmappedRuleId, Heel.UnmappedSuffix)
    val fromDists = Heel.distRules.map { r =>
      shape(
        r.ids.fold(dists)(ids => dists.filter(col("analysis_id").isin(ids: _*)))
          .filter(expr(r.predicate))
          .groupBy("analysis_id").agg(count(lit(1)).as("record_count")),
        r.severity, r.ruleId, r.suffix)
    }
    (fromCounts ++ Seq(unmapped) ++ fromDists).reduce(_ unionByName _)
  }
}
