package graft

import org.apache.spark.sql.functions._

import graft.sources.WriteKeyAuth._

class WriteKeyAuthSpec extends GraftSpec {

  test("security: hash round-trip (ref security.test.ts 'security')") {
    // ref: createHash(password) verifies; a corrupted hash (prefix
    // stripped) does not
    val password = "secretPassword"
    val h = createHash(password)
    assert(checkHash(h, password))
    assert(!checkHash(h.substring(2), password))
  }

  test("security: authorizer (ref security.test.ts 'authorizer')") {
    val hashedSecret = "215ef940-8f78-42bf-ab36-185090b9b62e"
    val plaintextSecret = "af0e7958-5a10-4264-af4e-2516a630b602"
    var auth = createAuthorized(createHash(hashedSecret), checkHash(_, _))
    assert(!auth(plaintextSecret))
    assert(auth(hashedSecret))
    assert(!auth("wrong"))

    auth = createAuthorized(plaintextSecret, checkRawToken)
    assert(auth(plaintextSecret))
    assert(!auth(hashedSecret))
    assert(!auth("wrong"))
  }

  test("security hardenings: seed rotation, malformed hash, hint, isValidSecret") {
    // a credential minted under an OLD seed still verifies as long as
    // that seed stays in the rotation list (the reference's comma list)
    val seeds = Seq("new-seed", "old-seed")
    val old = createHash("s3cretVal", Seq("old-seed"), salt = Some("aabb"))
    assert(checkHash(old, "s3cretVal", seeds))
    assert(!checkHash(old, "s3cretVal", Seq("new-seed")))
    // no '.' -> invalid form, never a match (ref checkHash :38-41)
    assert(!checkHash("nodothere", "nodothere"))
    assert(hint("215ef940-8f78") == "215*f78")
    assert(hint("ab") == "ab*ab") // JS-substring clamping
    assert(isValidSecret("abcd-EF_09"))
    assert(!isValidSecret("short"))
    assert(!isValidSecret("has:colon-xx"))
  }

  test("randomId (ref id.test.ts): lengths, prefix, leading non-digit") {
    val id1 = randomId()
    val id2 = randomId(10)
    val id4 = randomId(10, prefix = "test")
    assert(id1.length > 10)
    assert(id2.length == 10)
    assert(id4.length == "test_".length + 10)
    assert(id4.startsWith("test_"))
    // first char is never a digit (ref randomChar(noDigits=true))
    (1 to 50).foreach(_ => assert(!randomId(5).head.isDigit))
  }

  test("authorize: broadcast key-store check over an event stream") {
    import spark.implicits._
    val seeds = Seq("rot-seed-2", "rot-seed-1")
    // wk0 hashed under the head seed, wk1 under the OLD seed (rotation),
    // wk2 stored raw (checkRawToken path) — fixed salts for determinism
    val keys = Seq(
      ("wk0", createHash("secret-wk0", Seq("rot-seed-2"), Some("salt0"))),
      ("wk1", createHash("secret-wk1", Seq("rot-seed-1"), Some("salt1"))),
      ("wk2", "raw-token-wk2")
    ).toDF("id", "credential")
    val events = Seq(
      (1L, "wk0:secret-wk0"),   // ok (head seed)
      (2L, "wk1:secret-wk1"),   // ok (old seed still in rotation)
      (3L, "wk2:raw-token-wk2"),// ok (raw)
      (4L, "wk0:wrong"),        // bad secret
      (5L, "wk9:secret-wk0"),   // unknown key id
      (6L, "wk0"),              // no ':' -> malformed
      (7L, null),               // missing token
      // the reference destructures split(":") and DISCARDS a third
      // segment (api.ts:120), so trailing garbage still authorizes
      (8L, "wk2:raw-token-wk2:extra")
    ).toDF("event_id", "write_key")
    val byId = authorize(events, keys, col("write_key"), seeds)
      .select("event_id", "auth_ok").as[(Long, Boolean)].collect().toMap
    assert(byId == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false,
      5L -> false, 6L -> false, 7L -> false, 8L -> true))
    // the Column-path verdicts agree with the JVM twin run row-by-row
    val jvm = Map(
      "wk0:secret-wk0" -> true, "wk1:secret-wk1" -> true,
      "wk2:raw-token-wk2" -> true, "wk0:wrong" -> false,
      "wk9:secret-wk0" -> false)
    val creds = Map("wk0" -> createHash("secret-wk0", Seq("rot-seed-2"),
        Some("salt0")),
      "wk1" -> createHash("secret-wk1", Seq("rot-seed-1"), Some("salt1")),
      "wk2" -> "raw-token-wk2")
    jvm.foreach { case (tok, expected) =>
      val Array(id, secret) = tok.split(":", -1).take(2)
      val got = creds.get(id).exists(c =>
        if (c.contains(".")) checkHash(c, secret, seeds)
        else checkRawToken(c, secret))
      assert(got == expected, tok)
    }
    // hint carries ONLY the keyId segment — never the secret's tail
    // (the hint is persisted into quarantine/log tables)
    val hints = authorize(events, keys, col("write_key"), seeds)
      .select("event_id", "key_hint").as[(Long, Option[String])]
      .collect().toMap
    assert(hints(1L).contains("wk0"))
    assert(hints(7L).isEmpty) // null token -> no hint
    // a long key id abbreviates 3+*+3 over the ID alone
    val longKeys = Seq(("jitsu-like-long-id", "raw")).toDF("id", "credential")
    val longEv = Seq((1L, "jitsu-like-long-id:super-secret"))
      .toDF("event_id", "write_key")
    val h2 = authorize(longEv, longKeys, col("write_key"), seeds)
      .select("key_hint").as[String].collect()
    assert(h2.toSeq == Seq("jit*-id"), h2.toSeq)
    assert(!h2.head.contains("ret"), "hint leaked the secret tail")
  }

  test("authorize stays codegen'd and broadcasts the key store") {
    import spark.implicits._
    val keys = Seq(("wk0", "raw")).toDF("id", "credential")
    val events = Seq((1L, "wk0:raw")).toDF("event_id", "write_key")
    val plan = authorize(events, keys, col("write_key"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
