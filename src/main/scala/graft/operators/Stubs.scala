package graft.operators

import graft.Q

object DedupOps { val qs: Seq[Q] = Seq.empty }
object SimilarityOps { val qs: Seq[Q] = Seq.empty }
object Lakehouse { val qs: Seq[Q] = Seq.empty }
object Multimodal { val qs: Seq[Q] = Seq.empty }
