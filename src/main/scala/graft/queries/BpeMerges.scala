package graft.queries

/** FROZEN BPE merge table — the learned-tokenizer constant shared by the
  * Spark plans and the DuckDB oracle SQL (the IvfCentroids / PqCodebooks
  * pattern: derived constants are computed once and interpolated into both
  * engines as literals, so there is a single source of truth and zero
  * cross-engine drift).
  *
  * Provenance: `graft.functions.Bpe.train(wordCounts, 64)` over the
  * whitespace word counts of `/root/testdata/sf0.01/documents.parquet`
  * (31 distinct words, 27165 occurrences). Training is deterministic
  * (count ties break on the lexicographically smallest pair), so this
  * table is reproducible from the data. 64 merges keeps the segmentation
  * genuinely subword on this vocabulary — common stems fuse ("join",
  * "hash", "batch", "order"), rarer words stay split — which is exactly
  * the regime token budgets care about. A production table is trained the
  * same way at 10k-50k merges from an aggregated word-count pass.
  */
object BpeMerges {

  val Merges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("j", "o"), ("jo", "in"),
    ("a", "s"), ("as", "h"), ("h", "ash"), ("r", "ow"),
    ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"),
    ("co", "lu"), ("colu", "m"), ("colum", "n"), ("cu", "st"),
    ("cust", "o"), ("custo", "mer"), ("f", "i"), ("fi", "l"),
    ("fil", "t"), ("filt", "er"), ("a", "l"), ("al", "l"),
    ("m", "all"), ("s", "mall"), ("g", "e"), ("l", "ow"),
    ("mer", "ge"), ("s", "low"), ("c", "t"), ("ct", "or"),
    ("d", "er"), ("e", "ctor"), ("or", "der"), ("v", "ector"),
    ("in", "e"), ("l", "ine"), ("a", "b"), ("ab", "l"),
    ("abl", "e"), ("at", "a"), ("d", "ata"), ("t", "able"),
    ("u", "p"), ("a", "g"), ("ag", "g"), ("a", "lu"),
    ("alu", "e"), ("v", "alue"), ("e", "y"), ("k", "ey"))
}
