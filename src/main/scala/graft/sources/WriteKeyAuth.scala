package graft.sources

import java.nio.charset.StandardCharsets
import java.security.{MessageDigest, SecureRandom}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest authentication — the reference's token surface at every HTTP
  * boundary (ref `libs/juava/src/security.ts:14-67`, contract pinned by
  * its own `security.test.ts`, replayed verbatim in WriteKeyAuthSpec):
  * a stored credential is either a RAW token (plain string compare, ref
  * `checkRawToken` :33) or a SALTED HASH in `salt.sha512hex` form where
  * the digest covers `secret + salt + globalSeed` (ref `hashInternal`
  * :14-16), checked against every seed in the rotation list (ref
  * `checkHash` :37-43 — the seed list is what lets a deployment rotate
  * `GLOBAL_HASH_SECRET` without re-hashing stored keys). API keys are
  * presented as `keyId:secret` bearer tokens and looked up by id before
  * the hash check (ref `webapps/console/lib/api.ts:120-133`, rotor's
  * boundary `services/rotor/src/index.ts:252-268`).
  *
  * [[authorize]] is the same contract applied to an EVENT STREAM at
  * ingest scale: the key store is a small dimension (thousands of keys)
  * so it broadcasts, and the per-event digest is Spark's built-in
  * `sha2(…, 512)` — the whole check stays inside whole-stage codegen,
  * no UDF, no driver round-trip, and unknown key ids cost only the
  * broadcast-hash probe.
  */
object WriteKeyAuth {

  /** Default seed when no rotation list is configured — the reference
    * ships one too (`security.ts:3`) so hashes are portable across
    * unconfigured dev environments; ours differs deliberately (theirs
    * is their deployment's constant, not part of the contract). */
  val DefaultSeed = "graft-default-hash-seed"

  /** Hex digest, ref `security.ts:18-22`. */
  def hash(algorithm: String, value: String): String = {
    val md = MessageDigest.getInstance(algorithm)
    md.digest(value.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def hashInternal(secret: String, salt: String, seed: String): String =
    s"$salt.${hash("SHA-512", secret + salt + seed)}"

  /** Salted hash of a secret under the FIRST seed (new credentials are
    * always minted under the head of the rotation list, ref
    * `createHash` :28-31). `salt` is injectable for deterministic
    * fixtures; production callers omit it and get 16 random bytes. */
  def createHash(secret: String, seeds: Seq[String] = Seq(DefaultSeed),
                 salt: Option[String] = None): String = {
    val s = salt.getOrElse {
      val b = new Array[Byte](16)
      new SecureRandom().nextBytes(b)
      b.map("%02x".format(_)).mkString
    }
    hashInternal(secret, s, seeds.head)
  }

  /** ref `checkRawToken` :33-35: a raw credential is a plain compare. */
  def checkRawToken(hashOrPlain: String, secret: String): Boolean =
    secret == hashOrPlain

  /** ref `checkHash` :37-43: reject non-`salt.hash` forms, then accept
    * if ANY rotation seed reproduces the stored hash. */
  def checkHash(stored: String, secret: String,
                seeds: Seq[String] = Seq(DefaultSeed)): Boolean =
    stored.indexOf('.') >= 0 && {
      val salt = stored.substring(0, stored.indexOf('.'))
      seeds.exists(seed => stored == hashInternal(secret, salt, seed))
    }

  /** ref `createAuthorized` :56-67: an authorizer over a comma list of
    * credentials, each raw or hashed per `checkFunc`. */
  def createAuthorized(tokens: String,
      checkFunc: (String, String) => Boolean): String => Boolean = {
    val creds = tokens.split(',').map(_.trim).filter(_.nonEmpty)
    secret => creds.exists(c => checkFunc(c, secret))
  }

  /** ref `hint` :24-26: the loggable 3+*+3 abbreviation of a key (JS
    * substring clamps out-of-range indices, so a short key degrades to
    * `ab*ab` instead of throwing — mirrored). */
  def hint(key: String): String =
    key.substring(0, math.min(3, key.length)) + "*" +
      key.substring(math.max(0, key.length - 3))

  /** ref `isValidSecret` :45-47. */
  def isValidSecret(secret: String): Boolean =
    secret.length >= 8 && secret.forall(c =>
      c.isLetterOrDigit && c < 128 || c == '-' || c == '_')

  /** ref `libs/juava/src/id.ts:8-27` (`randomId`, pinned by
    * `id.test.ts`): `digits` chars from [0-9a-zA-Z], first char never a
    * digit, `prefix` joined with `_`. */
  def randomId(digits: Int = 24, prefix: String = ""): String = {
    val chars = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val rnd = new SecureRandom()
    val id = new StringBuilder
    while (id.length < digits) {
      val c = chars.charAt(rnd.nextInt(chars.length))
      if (id.nonEmpty || !c.isDigit) id.append(c)
    }
    (if (prefix.nonEmpty) prefix + "_" else "") + id.result()
  }

  /** The ingest-boundary check over an event stream: each event's
    * `tokenCol` (`keyId:secret` bearer form) is validated against a
    * key-store dimension `keys(id, credential)` where `credential` is
    * raw or `salt.sha512hex`, exactly the [[checkHash]]/[[checkRawToken]]
    * split. Adds `auth_ok` (boolean; false for unknown ids, malformed
    * tokens, and wrong secrets — the reference 401s all three
    * identically, `rotor/src/index.ts:170-177`) and `key_hint` (the
    * loggable abbreviation of the keyId SEGMENT only — the secret never
    * reaches the hint; null when the token has no id segment).
    *
    * Scale shape: `keys` broadcasts (key stores are thousands of rows);
    * the digest is the codegen'd built-in `sha2`, computed once per
    * (event × matched credential) — a LEFT join keeps unauthorized
    * events in-stream so the caller routes them to quarantine instead
    * of silently dropping (the pipeline's corrupt-row contract).
    * `keys.id` must be unique (it is the store's primary key — ref
    * `findUnique` api.ts:127); a store modeling credential rotation as
    * duplicate ids must pre-aggregate, or the join would multiply
    * events. */
  def authorize(events: DataFrame, keys: DataFrame,
                tokenCol: Column,
                seeds: Seq[String] = Seq(DefaultSeed)): DataFrame = {
    // `const [keyId, secret] = bearerToken.split(":")` (api.ts:120):
    // the reference destructures the first two segments, so a secret
    // is everything between the first and second colon. `get` (never
    // throws out-of-bounds, unlike element_at under ANSI) reproduces
    // the destructure; both must be non-empty (JS truthiness :126).
    val parts = split(tokenCol, ":")
    val keyId = get(parts, lit(0))
    val secret = get(parts, lit(1))
    val salt = substring_index(col("credential"), ".", 1)
    val storedHex = substring_index(col("credential"), ".", -1)
    // hashed path: any rotation seed may reproduce the digest; raw
    // path: plain compare. Both stay codegen'd column expressions.
    val hashOk = seeds.map(seed =>
        sha2(concat(col("_secret"), salt, lit(seed)), 512) === storedHex)
      .reduce(_ || _)
    val ok = when(instr(col("credential"), ".") > 0, hashOk)
      .otherwise(col("credential") === col("_secret"))
    events
      .withColumn("_key_id",
        when(length(keyId) > 0 && length(secret) > 0, keyId))
      .withColumn("_secret", secret)
      .join(broadcast(keys.select(col("id").as("_key_id"),
        col("credential"))), Seq("_key_id"), "left")
      .withColumn("auth_ok",
        coalesce(col("credential").isNotNull && ok, lit(false)))
      .withColumn("key_hint", {
        // hint ONLY the keyId segment (everything before the first
        // ':'): the hint lands in quarantine/log tables, and a hint
        // over the full token would persist the SECRET's tail. Key ids
        // are public identifiers, so short ids log as-is; long ids
        // abbreviate; an empty segment (`:secret`, empty token) hints
        // null.
        val hintSrc = substring_index(tokenCol, ":", 1)
        when(length(hintSrc) >= 6,
          concat(substring(hintSrc, 1, 3), lit("*"),
            substring(hintSrc, -3, 3)))
          .otherwise(when(length(hintSrc) > 0, hintSrc))
      })
      .drop("_key_id", "_secret", "credential")
  }
}
