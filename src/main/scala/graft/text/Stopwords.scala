package graft.text

/** NLTK English stopword list, pinned at the reference era (~2018, nltk 3.2.5,
  * 179 entries) — the reference filters with `stopwords.words("english")`
  * (00_training_pipeline.py:58,87; 01_classification_pipeline.py:71,116).
  *
  * Pinned verbatim (NOT Spark's StopWordsRemover default list, which
  * differs). The apostrophe entries can never match `\w+` tokens but are
  * kept so the list is the exact published artifact; `tokensOnly` is the
  * filter set actually applied after tokenization.
  */
object Stopwords {
  val nltkEnglish: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "you're", "you've", "you'll", "you'd", "your", "yours",
    "yourself", "yourselves", "he", "him", "his", "himself", "she",
    "she's", "her", "hers", "herself", "it", "it's", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "that'll", "these", "those", "am",
    "is", "are", "was", "were", "be", "been", "being", "have", "has",
    "had", "having", "do", "does", "did", "doing", "a", "an", "the",
    "and", "but", "if", "or", "because", "as", "until", "while", "of",
    "at", "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't",
    "weren", "weren't", "won", "won't", "wouldn", "wouldn't")

  /** entries that can appear as `\w+` tokens (no apostrophes) */
  val tokensOnly: Seq[String] = nltkEnglish.filterNot(_.contains("'"))

  val tokenSet: Set[String] = tokensOnly.toSet

  /** the list as a DuckDB SQL array literal, for oracle twins */
  def duckdbArray: String =
    tokensOnly.map(w => s"'$w'").mkString("[", ", ", "]")
}
