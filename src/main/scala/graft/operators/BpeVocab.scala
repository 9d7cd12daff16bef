package graft.operators

/** COMMITTED BPE merge table — the tokenizer-as-artifact fixture.
  *
  * Trained ONCE by [[Bpe.trainMerges]] (numMerges = 200, maxWords =
  * 5000, no end-of-word marker) over the sf0.01 documents corpus and
  * committed, the way production tokenizers ship: encoding under a
  * FIXED vocabulary is the realistic steady-state operation, and a
  * fixed table is what lets the driver oracle replay the encode in
  * SQL (`q_bpe_tokens` inlines these pairs as a VALUES literal).
  * Training stopped at 89 merges — the synthetic corpus
  * vocabulary fully fuses before 200. Training itself remains
  * query-covered by `q_bpe_roundtrip` (trained per run, decode
  * roundtrip oracle) and spec-pinned in `BpeSpec`.
  */
object BpeVocab {
  val merges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"), ("custo", "mer"),
    ("f", "i"), ("fi", "l"), ("fil", "t"), ("filt", "er"), ("a", "l"),
    ("al", "l"), ("m", "all"), ("s", "mall"), ("g", "e"), ("l", "ow"),
    ("mer", "ge"), ("s", "low"), ("c", "t"), ("ct", "or"), ("d", "er"),
    ("e", "ctor"), ("or", "der"), ("v", "ector"), ("in", "e"), ("l", "ine"),
    ("a", "b"), ("ab", "l"), ("abl", "e"), ("at", "a"), ("d", "ata"),
    ("t", "able"), ("u", "p"), ("a", "g"), ("ag", "g"), ("a", "lu"),
    ("alu", "e"), ("v", "alue"), ("e", "y"), ("k", "ey"), ("a", "m"),
    ("e", "am"), ("r", "eam"), ("st", "ream"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("par", "k"), ("s", "park"), ("g", "r"), ("gr", "o"),
    ("gro", "up"), ("par", "t"), ("b", "i"), ("bi", "g"), ("or", "t"),
    ("s", "ort"), ("er", "y"), ("q", "u"), ("qu", "ery"), ("a", "st"),
    ("f", "ast"), ("h", "e"), ("t", "he"), ("d", "up"))
}
