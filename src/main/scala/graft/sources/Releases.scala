package graft.sources

/** Release-version policy — parity with the reference's release gate
  * (`overturemaestro/release_index.py:47,581-586` and
  * `get_available_theme_type_pairs:280-295`). Release ordering is
  * lexicographic on the release string, exactly as the reference
  * compares them. */
object Releases {

  /** `MINIMAL_SUPPORTED_RELEASE_VERSION` (release_index.py:47). */
  final val MinimalSupported = "2024-04-16-beta.0"

  /** Reference `ReleaseVersionNotSupportedError`. */
  final class ReleaseVersionNotSupportedError(msg: String)
      extends IllegalArgumentException(msg)

  /** `_check_release_version` — reference error text preserved. */
  def checkReleaseVersion(release: String): Unit =
    if (release < MinimalSupported)
      throw new ReleaseVersionNotSupportedError(
        s"Release version $release is not supported." +
          s" Minimal supported version is $MinimalSupported.")

  /** The newest release this offline build knows about (the reference
    * resolves "newest" from the network catalog; here the registry is
    * the catalog). */
  final val NewestKnown = "2025-01-22.0"

  /** `get_available_theme_type_pairs` analog: the (theme, type) pairs
    * convertible for `release`, sorted. Offline the wide-form registry
    * is the authoritative pair catalog (the reference reads its release
    * index, which this sandbox replaces with config — SURVEY S5/S6). */
  def availableThemeTypePairs(release: String = NewestKnown): Seq[(String, String)] = {
    checkReleaseVersion(release)
    graft.operators.WideFormRegistry.forRelease(release).keys.toSeq.sorted
  }
}
