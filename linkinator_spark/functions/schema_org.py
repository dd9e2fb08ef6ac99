"""schema.org field names whose string values are URLs.

Behavioral spec from the reference's JSON-LD whitelist
(/root/reference/src/schema-org-url-fields.json, 81 public schema.org
property names) — this is public schema.org vocabulary, re-declared here.
"""

SCHEMA_ORG_URL_FIELDS = frozenset(
    [
        "acquireLicensePage", "actionableFeedbackPolicy", "afterMedia",
        "archivedAt", "associatedDisease", "beforeMedia", "benefitsSummaryUrl",
        "codeRepository", "colleague", "colorSwatch", "constraintProperty",
        "contentUrl", "correctionsPolicy", "discussionUrl",
        "diseasePreventionInfo", "diseaseSpreadStatistics", "diversityPolicy",
        "diversityStaffingReport", "documentation", "downloadUrl",
        "duringMedia", "embedUrl", "ethicsPolicy", "gameLocation",
        "gettingTestedInfo", "hasGS1DigitalLink", "hasMap",
        "hasMolecularFunction", "healthPlanMarketingUrl", "image", "inCodeSet",
        "inDefinedTermSet", "installUrl", "isBasedOn", "isBasedOnUrl",
        "isInvolvedInBiologicalProcess", "isLocatedInSubcellularLocation",
        "isPartOf", "labelDetails", "layoutImage", "license", "logo",
        "mainEntityOfPage", "map", "maps", "masthead", "merchantReturnLink",
        "missionCoveragePrioritiesPolicy", "newsUpdatesAndGuidelines",
        "noBylinesPolicy", "originalMediaLink", "paymentUrl",
        "prescribingInfo", "productReturnLink", "publicTransportClosuresInfo",
        "publishingPrinciples", "quarantineGuidelines", "relatedLink",
        "replyToUrl", "sameAs", "schoolClosuresInfo", "screenshot",
        "sdLicense", "season", "serviceUrl", "shippingSettingsLink",
        "significantLink", "significantLinks", "speakable", "target",
        "targetUrl", "thumbnailUrl", "tourBookingPage", "trackingUrl",
        "travelBans", "unnamedSourcesPolicy", "url", "usageInfo",
        "verificationFactCheckingPolicy", "webFeed",
    ]
)
