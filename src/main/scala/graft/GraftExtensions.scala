package graft

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Cluster-wide injection point for graft's custom Catalyst expressions:
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 * }}}
 *
 * installs `farm_fingerprint`, `shingle_set`, `affine_minhash`,
 * `sorted_intersect_size`, `dot_f64` and `winnow_fp` into every session the
 * cluster creates — the deployment shape a 1000-executor installation uses,
 * where per-session `GraftFunctions.register` calls in application code are
 * fragile (e.g. thrift/Connect servers that create sessions the app never
 * sees). The injected builders are the same instances the session-level
 * registration uses ([[graft.functions.GraftFunctions.builders]]), so SQL
 * text behaves identically through either path.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.builders.foreach { case (id, info, builder) =>
      extensions.injectFunction((id, info, builder))
    }
}
