package graft.operators

import graft.Q

object Lakehouse { val qs: Seq[Q] = Seq.empty }
