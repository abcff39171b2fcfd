package graft.util

/** Driver-side orchestration helpers — the §2 rows that are config
  * expansion rather than data-plane operators, kept as pure functions so
  * the inventory is closed line-by-line.
  *
  *  - S6 route discovery (get_data_from_apis_instance.py:105-185):
  *    explicit route suffixes expand to full URLs; swagger paths are
  *    selected when any of their methods carries a requested tag;
  *    templated paths (`{` in the url) are dropped.
  *  - P12 route URL normalization (get_data_from_apis_instance.py:128-133):
  *    strip redundant slashes, join base + route, ensure trailing slash.
  *  - P13 timedelta formatting (get_apis_data_and_push_to_repo.py:35-39,
  *    get_data_apis_vanilla.py:24-29): seconds → "Xh Ym Zs" run-report
  *    strings.
  */
object Routes {

  /** P12: base + route → normalized absolute URL with trailing slash. */
  def normalizeRoute(base: String, route: String): String = {
    val b = base.replaceAll("/+$", "")
    val r = route.replaceAll("^/+", "").replaceAll("/+$", "")
    if (r.isEmpty) s"$b/" else s"$b/$r/"
  }

  /** S6: expand explicit route suffixes and tag-selected swagger paths to
    * full URLs, dropping templated paths.
    *
    * @param routes       explicit route suffixes (always kept)
    * @param swaggerPaths path → tags carried by its methods
    * @param tags         requested tags; a swagger path is selected when it
    *                     shares at least one
    */
  def processRoutes(routes: Seq[String],
                    swaggerPaths: Map[String, Seq[String]],
                    apiUrl: String,
                    tags: Seq[String]): Seq[String] = {
    val explicit = routes.map(normalizeRoute(apiUrl, _))
    val discovered = swaggerPaths.toSeq
      .filter { case (path, pathTags) =>
        !path.contains("{") && pathTags.exists(tags.contains)
      }
      .map { case (path, _) => normalizeRoute(apiUrl, path) }
      .sorted
    (explicit ++ discovered).distinct
  }

  /** P13: seconds → "Xh Ym Zs". */
  def formatDuration(seconds: Long): String = {
    require(seconds >= 0, "duration must be non-negative")
    val h = seconds / 3600
    val m = (seconds % 3600) / 60
    val s = seconds % 60
    s"${h}h ${m}m ${s}s"
  }
}
