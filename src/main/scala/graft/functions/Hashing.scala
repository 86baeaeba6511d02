package graft.functions

/** Shared 64-bit mixing/hash primitives (splitmix64 finalizer — Steele et
  * al., OOPSLA 2014, public domain). Single definition: the MinHash
  * permutation params, shingle/word hashing, hyperplane components, and the
  * synthetic generator all derive from this one function, so "cleanup" in any
  * module can never silently change persisted sketch values.
  */
object Hashing {
  def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
