package graft

import graft.ingest.Enrich
import graft.ingest.Enrich.CardFact
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the full rules-engine inventory (reference rules.rs:171-830)
  * with the reference's own example sentences — every rule family must
  * mint the card the reference documents for it. */
class EnrichRulesSpec extends AnyFunSuite {

  private def cards(text: String): Seq[CardFact] = Enrich.extractCards(text)

  test("first-person fact rules") {
    assert(cards("I work at Acme Corp.").contains(CardFact("user", "employer", "Acme Corp")))
    assert(cards("I work for Initech!").contains(CardFact("user", "employer", "Initech")))
    assert(cards("I'm a software engineer at Acme.").exists(c =>
      c.slot == "job_title" && c.value == "software engineer"))
    assert(cards("I live in Lisbon.").contains(CardFact("user", "location", "Lisbon")))
    assert(cards("My name is Bob.").contains(CardFact("user", "name", "Bob")))
    assert(cards("I am 34 years old.").contains(CardFact("user", "age", "34")))
    assert(cards("My email is a.b@example.com").contains(CardFact("user", "email", "a.b@example.com")))
    assert(cards("My birthday is March 15, 1990.").contains(
      CardFact("user", "birthday", "March 15, 1990")))
  }

  test("first-person preference rules") {
    assert(cards("I love eating sushi.").contains(CardFact("user", "food_like", "sushi")))
    assert(cards("I really hate cilantro.").contains(CardFact("user", "food_dislike", "cilantro")))
    assert(cards("I'm allergic to peanuts.").contains(CardFact("user", "allergy", "peanuts")))
    assert(cards("I love coding in Rust.").contains(
      CardFact("user", "programming_language", "Rust")))
    assert(cards("I code in Scala daily").contains(
      CardFact("user", "programming_language", "Scala")))
    assert(cards("My hobby is painting.").contains(CardFact("user", "hobby", "painting")))
  }

  test("first-person pet, family, travel rules") {
    assert(cards("I have a golden retriever named Max.").contains(
      CardFact("user", "pet_name", "Max")))
    assert(cards("My dog's name is Rex.").contains(CardFact("user", "pet_name", "Rex")))
    assert(cards("I have a hamster.").contains(CardFact("user", "pet", "hamster")))
    assert(cards("My sister's name is Ana").contains(CardFact("user", "sister", "Ana")))
    assert(cards("I visited Tokyo last spring.").contains(CardFact("user", "travel", "Tokyo")))
  }

  test("third-person employment and education rules") {
    assert(cards("Alice works at Acme Corp.").contains(
      CardFact("Alice", "employer", "Acme Corp")))
    assert(cards("Bob is the CEO of Startup Inc.").exists(c =>
      c.entity == "Bob" && c.slot == "role" && c.value == "CEO at Startup Inc"))
    assert(cards("Alice studied at MIT.").contains(CardFact("Alice", "education", "MIT")))
    assert(cards("John Smith has a degree in Computer Science.").contains(
      CardFact("John Smith", "degree", "Computer Science")))
    assert(cards("Alice majored in Physics.").contains(
      CardFact("Alice", "field_of_study", "Physics")))
    assert(cards("Mary works as an architect.").contains(
      CardFact("Mary", "job_title", "architect")))
  }

  test("third-person relationship rules") {
    assert(cards("Alice is married to Bob.").contains(CardFact("Alice", "spouse", "Bob")))
    assert(cards("John and Mary are married.").contains(CardFact("John", "spouse", "Mary")))
    assert(cards("Alice is Bob's wife.").contains(CardFact("Alice", "spouse", "Bob")))
    assert(cards("John's wife is Mary.").contains(CardFact("John", "spouse", "Mary")))
    assert(cards("Alice is Bob's mother.").contains(CardFact("Alice", "mother", "Bob")))
    assert(cards("Alice has a brother named Tom.").contains(
      CardFact("Alice", "brother", "Tom")))
  }

  test("third-person profile, preference, pet, event rules") {
    assert(cards("Alice loves pizza.").contains(CardFact("Alice", "preference", "pizza")))
    assert(cards("John dislikes crowds.").contains(CardFact("John", "dislike", "crowds")))
    assert(cards("Alice's favorite food is sushi.").contains(
      CardFact("Alice", "favorite_food", "sushi")))
    assert(cards("Alice is 28 years old.").contains(CardFact("Alice", "age", "28")))
    assert(cards("John was born in 1990.").contains(CardFact("John", "birthdate", "1990")))
    assert(cards("Alice lives in San Francisco.").contains(
      CardFact("Alice", "location", "San Francisco")))
    assert(cards("Alice's email is alice@example.com").contains(
      CardFact("Alice", "email", "alice@example.com")))
    assert(cards("John plays the piano.").contains(CardFact("John", "hobby", "piano")))
    assert(cards("Alice is interested in astronomy.").contains(
      CardFact("Alice", "interest", "astronomy")))
    assert(cards("Alice has a cat named Whiskers.").contains(
      CardFact("Alice", "pet_name", "Whiskers")))
    assert(cards("Bob's dog is named Max.").contains(CardFact("Bob", "pet_name", "Max")))
    assert(cards("Alice owns a golden retriever dog.").contains(
      CardFact("Alice", "pet", "golden retriever")))
    assert(cards("Alice visited Paris.").contains(CardFact("Alice", "travel", "Paris")))
    assert(cards("Alice founded Startup Labs in 2020.").contains(
      CardFact("Alice", "career_event", "Startup Labs")))
  }

  test("rule inventory breadth matches the reference (~40+ rules)") {
    assert(Enrich.defaultRules.size >= 40,
      s"only ${Enrich.defaultRules.size} rules — reference ships ~40 (rules.rs:171-830)")
    // every rule name unique, every template references valid groups
    val names = Enrich.defaultRules.map(_.name)
    assert(names.distinct.size == names.size)
  }
}
