package graft

/** Shared RSVP test-row builder shaped like
  * /root/reference/data_example.json (used by RsvpStreamSpec and
  * EventIOSpec).
  */
object RsvpFixtures {
  def rsvp(
      country: String, state: String, city: String,
      rsvpId: Long, eventTimeMs: Long = 1624379400000L): String =
    s"""{"venue":{"venue_name":"V","lon":-121.3,"lat":44.0,"venue_id":26124106},
       |"visibility":"public","response":"yes","guests":0,
       |"member":{"member_id":237162623,"photo":"p","member_name":"M"},
       |"rsvp_id":$rsvpId,"mtime":1622913129340,
       |"event":{"event_name":"E","event_id":"278643223","time":$eventTimeMs,"event_url":"u"},
       |"group":{"group_topics":[{"urlkey":"k","topic_name":"T"}],
       |"group_city":"$city","group_country":"$country","group_id":1,
       |"group_name":"G","group_lon":-121.0,"group_urlname":"g",
       |"group_state":"$state","group_lat":44.0}}""".stripMargin.replaceAll("\n", "")

  /** The exact Q2 wire payload for `rsvp("us","OR","Bend", _)` — the JSON
    * the reference emits to topic us_meetups for data_example-shaped input
    * (srapk_structure_streaming.py:140-143; event double-encoded,
    * group_name dropped, corrected epoch-millis event.time).
    */
  val q2GoldenBend: String =
    """{"event":"{\"event_id\":\"278643223\",\"event_name\":\"E\",""" +
      """\"time\":\"2021-06-22T16:30:00.000Z\"}","group_city":"Bend",""" +
      """"group_country":"us","group_id":1,"group_state":"OREGON"}"""
}
