package graft.model

/**
 * Data model for the alarm effective-state domain.
 *
 * Re-expressed (Spark-first, case classes + `Option`) from the entity usage
 * observed in the reference (see SURVEY.md §1.2):
 *  - `Alarm` instance registration: reference `RegistrationRuleTest.java:62-71`
 *  - `AlarmAction` class defaults: reference `RegistrationRuleTest.java:73-82`,
 *    `LatchRule.java:85-87`, `OnDelayRule.java:85-88`
 *  - activation union: reference `ActivationRule.java:392-395`
 *  - override union + set: reference `ActivationRule.java:199-275`
 *  - transitions: reference `ActivationRule.java:413-414`
 *
 * Tagged unions are flattened into a single case class with a discriminator
 * column plus nullable payload fields — this keeps the Spark schema columnar
 * and codegen-friendly (no Kryo-opaque encoders anywhere).
 */

/** Alarm instance registration (one per alarm name). */
final case class Alarm(
    action: Option[String] = None, // FK -> AlarmAction (class) name
    location: Seq[String] = Nil,
    maskedby: Option[String] = None,
    screencommand: Option[String] = None)

/** Alarm class defaults ("action" metadata). */
final case class AlarmAction(
    system: Option[String] = None,
    priority: Option[String] = None, // e.g. P1_CRITICAL .. P4_INCIDENTAL
    latchable: Boolean = false,
    filterable: Boolean = true,
    ondelayseconds: Option[Long] = None,
    offdelayseconds: Option[Long] = None,
    correctiveaction: Option[String] = None,
    rationale: Option[String] = None)

/**
 * Activation union flattened: `union` holds the variant tag.
 * Variants observed in the reference: Activation, NoActivation, plus
 * EPICS/Note payload variants (sevr/stat/note fields).
 */
final case class Activation(
    union: String = ActivationKind.Active,
    note: Option[String] = None,
    sevr: Option[String] = None,
    stat: Option[String] = None)

object ActivationKind {
  val Active = "Activation"
  val NoActivation = "NoActivation"
  val Epics = "EPICSActivation"
  val Note = "NoteActivation"

  /** Non-null AND not NoActivation == really active (reference `ActivationRule.java:392-395`). */
  def isReal(a: Option[Activation]): Boolean = a.exists(_.union != NoActivation)
}

/** Override union flattened: one class, 7 variants discriminated by `overrideType`. */
final case class AlarmOverride(
    overrideType: String, // OverrideType.* value
    comments: Option[String] = None,
    oneshot: Option[Boolean] = None, // Shelved only
    expiration: Option[Long] = None, // Shelved / OnDelayed / OffDelayed (epoch millis)
    reason: Option[String] = None) // Shelved only: ShelvedReason.*

object OverrideType {
  val Disabled = "Disabled"
  val Filtered = "Filtered"
  val Latched = "Latched"
  val Masked = "Masked"
  val OnDelayed = "OnDelayed"
  val OffDelayed = "OffDelayed"
  val Shelved = "Shelved"
  val all: Seq[String] =
    Seq(Disabled, Filtered, Latched, Masked, OnDelayed, OffDelayed, Shelved)
}

object ShelvedReason {
  val Stale = "Stale_Alarm"
  val Chattering = "Chattering_Fleeting_Alarm"
  val Other = "Other"
}

/** Compound key of the overrides changelog (reference `ActivationRule.java:316-321`). */
final case class OverrideKey(name: String, overrideType: String)

/**
 * The 7-slot pivoted override set (reference `ActivationRule.java:207-216`).
 * One nullable slot per override type; at most one override of each type can
 * be in force per alarm (enforced upstream by the (name, type) changelog key).
 */
final case class AlarmOverrideSet(
    disabled: Option[AlarmOverride] = None,
    filtered: Option[AlarmOverride] = None,
    latched: Option[AlarmOverride] = None,
    masked: Option[AlarmOverride] = None,
    offdelayed: Option[AlarmOverride] = None,
    ondelayed: Option[AlarmOverride] = None,
    shelved: Option[AlarmOverride] = None) {

  def get(overrideType: String): Option[AlarmOverride] = overrideType match {
    case OverrideType.Disabled => disabled
    case OverrideType.Filtered => filtered
    case OverrideType.Latched => latched
    case OverrideType.Masked => masked
    case OverrideType.OffDelayed => offdelayed
    case OverrideType.OnDelayed => ondelayed
    case OverrideType.Shelved => shelved
    case _ => None
  }
}

object AlarmOverrideSet {

  /**
   * Pivot a list of overrides into the 7-slot set — instanceof fan-out in the
   * reference (`ActivationRule.java:219-247`); later entries of the same type
   * win (list order = changelog order).
   */
  def fromList(overrides: Seq[AlarmOverride]): AlarmOverrideSet =
    overrides.foldLeft(AlarmOverrideSet()) { (acc, o) =>
      o.overrideType match {
        case OverrideType.Disabled => acc.copy(disabled = Some(o))
        case OverrideType.Filtered => acc.copy(filtered = Some(o))
        case OverrideType.Latched => acc.copy(latched = Some(o))
        case OverrideType.Masked => acc.copy(masked = Some(o))
        case OverrideType.OffDelayed => acc.copy(offdelayed = Some(o))
        case OverrideType.OnDelayed => acc.copy(ondelayed = Some(o))
        case OverrideType.Shelved => acc.copy(shelved = Some(o))
        case _ => acc
      }
    }
}

/** Per-record processor transition flags (reference `ProcessorTransitions` usage). */
final case class ProcessorTransitions(
    transitionToActive: Boolean = false,
    transitionToNormal: Boolean = false,
    latching: Boolean = false,
    unshelving: Boolean = false,
    ondelaying: Boolean = false,
    offdelaying: Boolean = false,
    masking: Boolean = false,
    unmasking: Boolean = false)

final case class EffectiveRegistration(
    alarm: Option[Alarm] = None,
    action: Option[AlarmAction] = None)

final case class EffectiveNotification(
    activation: Option[Activation] = None,
    overrides: AlarmOverrideSet = AlarmOverrideSet(),
    state: String = AlarmState.Normal)

/**
 * The denormalized per-alarm working record that flows through the pipeline
 * ("IntermediateMonolog" in the reference). We inline the alarm name so a
 * `Dataset[Monolog]` is self-contained.
 */
final case class Monolog(
    name: String,
    registration: EffectiveRegistration = EffectiveRegistration(),
    notification: EffectiveNotification = EffectiveNotification(),
    transitions: ProcessorTransitions = ProcessorTransitions())

final case class EffectiveAlarm(
    name: String,
    registration: EffectiveRegistration,
    notification: EffectiveNotification)

/** The 10-value effective alarm state (reference `EffectiveStateRule.java:180-221`). */
object AlarmState {
  val Normal = "Normal"
  val Active = "Active"
  val ActiveOffDelayed = "ActiveOffDelayed"
  val ActiveLatched = "ActiveLatched"
  val NormalOnDelayed = "NormalOnDelayed"
  val NormalOneShotShelved = "NormalOneShotShelved"
  val NormalContinuousShelved = "NormalContinuousShelved"
  val NormalMasked = "NormalMasked"
  val NormalFiltered = "NormalFiltered"
  val NormalDisabled = "NormalDisabled"
  val all: Seq[String] = Seq(
    Normal, Active, ActiveOffDelayed, ActiveLatched, NormalOnDelayed,
    NormalOneShotShelved, NormalContinuousShelved, NormalMasked,
    NormalFiltered, NormalDisabled)
}
