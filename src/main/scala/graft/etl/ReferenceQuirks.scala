package graft.etl

/** Opt-in reproduction of reference-implementation quirks the engine
  * deliberately deviates from by default.
  *
  * The engine's defaults are the CORRECT semantics (documented
  * deviations, SURVEY §1.2); `strict` exists so a user migrating off the
  * reference can demand byte-for-byte output parity during a cutover
  * diff, then drop back to the clean defaults.
  *
  *  - `nanOverview` — the reference keeps a pandas NaN overview as the
  *    literal string `'nan'` (loader.py:141-142: `str()` of a float NaN
  *    passes the non-empty gate). Default emits NULL.
  */
final case class ReferenceQuirks(nanOverview: Boolean = false)

object ReferenceQuirks {
  /** Engine semantics: clean NULLs. */
  val default: ReferenceQuirks = ReferenceQuirks()

  /** Byte-for-byte parity with the reference loader's output. */
  val strict: ReferenceQuirks = ReferenceQuirks(nanOverview = true)
}
