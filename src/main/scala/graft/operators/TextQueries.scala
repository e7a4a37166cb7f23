package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.exprs._
import graft.model.Tables

/** Text-analysis operators for a training-data pipeline: token
  * counting (whitespace + regex token classes), quality scoring
  * (length/stopword/structure ratios), n-gram-heuristic language id,
  * and document fingerprinting (Karp-Rabin rolling hash as a native
  * Catalyst expression, replayed in the oracle via a recursive CTE).
  *
  * All scores derive from exact integer counts; the only floating
  * math is a final fixed-shape expression over those ints, which is
  * bit-deterministic across engines.
  */
object TextQueries {

  // Token counting: whitespace tokens + regex token classes
  // (a BPE-ish pre-tokenizer: letter runs / digit runs / other).
  private val tokens = Q(
    "ta_token_count",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(
          $"doc_id",
          size(split($"text", " ")).as("n_ws_tokens"),
          regexp_count($"text", lit("[a-zA-Z]+")).as("n_alpha_runs"),
          regexp_count($"text", lit("[0-9]+")).as("n_digit_runs"),
          length($"text").as("n_chars_measured"),
        )
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
           |       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
           |       CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS INT) AS n_alpha_runs,
           |       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_digit_runs,
           |       CAST(length(text) AS INT) AS n_chars_measured
           |FROM documents
           |ORDER BY doc_id""".stripMargin),
  )

  // Quality scoring from exact integer counts.
  private val quality = Q(
    "ta_quality_score",
    (s, d) => {
      import s.implicits._
      val stop = Seq("the", "a", "of", "and", "to")
      val words = split($"text", " ")
      Tables.documents(s, d)
        .select(
          $"doc_id",
          size(words).as("n_words"),
          size(filter(words, w => w.isin(stop.map(x => x: Any): _*))).as("n_stop"),
          length($"text").as("len"),
        )
        .select(
          $"doc_id",
          $"n_words",
          ($"n_stop".cast("double") / $"n_words").as("stopword_ratio"),
          (($"len" - $"n_words" + 1).cast("double") / $"n_words").as("avg_word_len"),
          when($"n_words" >= 20 && $"n_words" <= 80, 1.0).otherwise(0.0).as("len_ok"),
        )
        .select(
          $"doc_id", $"n_words", $"stopword_ratio", $"avg_word_len",
          ($"stopword_ratio" * 0.4 + $"len_ok" * 0.6).as("quality"),
        )
        .orderBy($"doc_id")
    },
    Some("""WITH counts AS (
           |  SELECT doc_id,
           |         len(string_split(text, ' ')) AS n_words,
           |         len(list_filter(string_split(text, ' '),
           |             w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
           |         length(text) AS len
           |  FROM documents),
           |ratios AS (
           |  SELECT doc_id,
           |         CAST(n_words AS INT) AS n_words,
           |         CAST(n_stop AS DOUBLE) / n_words AS stopword_ratio,
           |         CAST(len - n_words + 1 AS DOUBLE) / n_words AS avg_word_len,
           |         CASE WHEN n_words BETWEEN 20 AND 80 THEN 1.0 ELSE 0.0 END AS len_ok
           |  FROM counts)
           |SELECT doc_id, n_words, stopword_ratio, avg_word_len,
           |       stopword_ratio * 0.4 + len_ok * 0.6 AS quality
           |FROM ratios
           |ORDER BY doc_id""".stripMargin),
  )

  // Language id: stopword-marker voting with a deterministic
  // tie-break order (en, es, de, fr, zh).
  private val langid = Q(
    "ta_language_id",
    (s, d) => {
      import s.implicits._
      val words = split($"text", " ")
      def score(markers: Seq[String]) =
        size(filter(words, w => w.isin(markers.map(x => x: Any): _*)))
      Tables.documents(s, d)
        .select(
          $"doc_id", $"lang".as("labeled_lang"),
          score(Seq("the", "a", "of", "and")).as("s_en"),
          score(Seq("el", "la", "de", "y")).as("s_es"),
          score(Seq("der", "die", "das", "und")).as("s_de"),
          score(Seq("le", "la", "et", "un")).as("s_fr"),
          score(Seq("的", "是", "在", "了")).as("s_zh"),
        )
        .select(
          $"doc_id", $"labeled_lang",
          when(greatest($"s_en", $"s_es", $"s_de", $"s_fr", $"s_zh") === 0, "und")
            .when($"s_en" >= greatest($"s_es", $"s_de", $"s_fr", $"s_zh"), "en")
            .when($"s_es" >= greatest($"s_de", $"s_fr", $"s_zh"), "es")
            .when($"s_de" >= greatest($"s_fr", $"s_zh"), "de")
            .when($"s_fr" >= $"s_zh", "fr")
            .otherwise("zh").as("predicted_lang"),
        )
        .orderBy($"doc_id")
    },
    Some("""WITH scores AS (
           |  SELECT doc_id, lang AS labeled_lang,
           |         len(list_filter(string_split(text, ' '),
           |             w -> w IN ('the', 'a', 'of', 'and'))) AS s_en,
           |         len(list_filter(string_split(text, ' '),
           |             w -> w IN ('el', 'la', 'de', 'y'))) AS s_es,
           |         len(list_filter(string_split(text, ' '),
           |             w -> w IN ('der', 'die', 'das', 'und'))) AS s_de,
           |         len(list_filter(string_split(text, ' '),
           |             w -> w IN ('le', 'la', 'et', 'un'))) AS s_fr,
           |         len(list_filter(string_split(text, ' '),
           |             w -> w IN ('的', '是', '在', '了'))) AS s_zh
           |  FROM documents)
           |SELECT doc_id, labeled_lang,
           |       CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
           |            WHEN s_en >= greatest(s_es, s_de, s_fr, s_zh) THEN 'en'
           |            WHEN s_es >= greatest(s_de, s_fr, s_zh) THEN 'es'
           |            WHEN s_de >= greatest(s_fr, s_zh) THEN 'de'
           |            WHEN s_fr >= s_zh THEN 'fr'
           |            ELSE 'zh' END AS predicted_lang
           |FROM scores
           |ORDER BY doc_id""".stripMargin),
  )

  // Document fingerprint: Karp-Rabin rolling hash (native Catalyst
  // expression; oracle replays the same recurrence char-by-char).
  private val fingerprint = Q(
    "ta_fingerprint",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", rolling_hash($"text").as("fingerprint"))
        .orderBy($"doc_id")
    },
    Some("""WITH RECURSIVE roll AS (
           |  SELECT doc_id, text, length(text) AS n, 0 AS i, 0::BIGINT AS h
           |  FROM documents
           |  UNION ALL
           |  SELECT doc_id, text, n, i + 1,
           |         (h * 31 + ord(substr(text, i + 1, 1))) % 2147483647
           |  FROM roll WHERE i < n)
           |SELECT doc_id, h AS fingerprint
           |FROM roll WHERE i = n
           |ORDER BY doc_id""".stripMargin),
  )

  // Deterministic hash-based sampling: a stable 10% sample selected by
  // content-independent hash ranges — reproducible across runs,
  // engines, and partitionings (unlike rand()-based sampling).
  private val stableSample = Q(
    "ta_stable_sample",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .filter(
          expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT)") % 100 < 10)
        .select($"doc_id", $"source")
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id, source
           |FROM documents
           |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 < 10
           |ORDER BY doc_id""".stripMargin),
  )

  // Train/val/test split by stable hash buckets (80/10/10): the
  // reproducible dataset-split step of a training pipeline.
  private val split3 = Q(
    "td_train_val_test_split",
    (s, d) => {
      import s.implicits._
      val bucket =
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT)") % 100
      Tables.documents(s, d)
        .select(
          $"doc_id",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
            .as("split"),
        )
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
           |       CASE WHEN b < 80 THEN 'train'
           |            WHEN b < 90 THEN 'val'
           |            ELSE 'test' END AS split
           |FROM (SELECT doc_id,
           |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 AS b
           |      FROM documents)
           |ORDER BY doc_id""".stripMargin),
  )

  // Native Generator surface: word bigrams emitted by the custom
  // NGrams UDTF (one lazily-streamed row per n-gram), checked against
  // the window-lead formulation in SQL.
  private val bigramsUdtf = Q(
    "ta_ngrams_generator",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .filter($"doc_id" < 100)
        .select($"doc_id", ngrams($"text", 2).as(Seq("pos", "ngram")))
        .orderBy($"doc_id", $"pos")
    },
    Some("""SELECT doc_id, CAST(pos - 1 AS INT) AS pos,
           |       word || ' ' || next_word AS ngram
           |FROM (
           |  SELECT doc_id, pos, word, lead(word, 1) OVER w AS next_word
           |  FROM (
           |    SELECT doc_id,
           |           unnest(string_split(text, ' ')) AS word,
           |           unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
           |    FROM documents WHERE doc_id < 100)
           |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
           |WHERE next_word IS NOT NULL
           |ORDER BY doc_id, pos""".stripMargin),
  )

  def all: Seq[Q] =
    Seq(tokens, quality, langid, fingerprint, stableSample, split3, bigramsUdtf)
}
