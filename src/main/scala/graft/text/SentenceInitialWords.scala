package graft.text

/** Known sentence-initial words: the reference breaks a sentence at a full
  * stop with NO following whitespace when the next token is an `ic` word
  * that is a known sentence starter or longer than 6 characters
  * (likely_sentence_initial_word, /root/reference/text/text_objects.pl:257-263;
  * fact table /root/reference/text/sentence_initial_words.pl — 1,537 rows).
  *
  * Fact-table extraction (data, not mechanism): only the 681 rows of
  * length <= 6 are stored — the `length > 6` disjunct subsumes the rest, so
  * this subset is semantically identical to the full table.
  */
object SentenceInitialWords {
  val words: Set[String] = (
    "About Above Access Acid Across Acta Action Active Acute Adding Adult " +
    "Adults After Again Agents Aging Aims Alaska Allele Almost Along Alpha " +
    "Also Amino Among Anal Anemia Animal Anion Ankle Anti Aortic Apart Apply " +
    "April Area Areas Army Array Asthma Atlas Atrial Auxin Axial Baker Barr " +
    "Basal Based Basic Bean Before Beige Being Benign Beside Best Beta Better " +
    "Beyond Biceps Bind Biol Biopsy Birth Black Blake Blood Body Bone Both " +
    "Bovine Boys Bragg Brain Braun Breast Brief Bright Brown Canada Cancer " +
    "Carat Carbon Care Carr Case Cases Cell Cells Change Chem Chen Child " +
    "China Chiral Choice Chop Clark Clarke Class Clay Clear Close Code Cold " +
    "Coll Color Common Copper Cord Corn Cost Cotton Cross Crown Crude Curie " +
    "Curt Curves Cyclic Cystic Daily Dane Dark Data Date David Davis Deaths " +
    "Deep Delta Dens Dental Design Diet Dimer Direct Disc Distal Does Dogs " +
    "Dosage Dose Doses Double Down Drug Drugs Dual During Each Early Edin " +
    "Effect Efflux Eight Eighty Eleven Elite Embryo Empty Energy Enzyme Equal " +
    "Even Every Except Expert Extra Facial Factor Family Fast Fatty Fecal " +
    "Female Fetal Fewer Fibrin Field Fifty Figure Filter Final First Fish " +
    "Five Flow Fluid Flux Focal Focus Follow Food Force Forced Form Forty " +
    "Four Fourth Frank Free Freeze Fresh From Frozen Full Future Gait Gamma " +
    "Gender Gene Genes Genet Genome George Give Given Global Golden Good " +
    "Google Grade Graft Grand Graphs Gray Greece Green Gross Ground Group " +
    "Groups Growth Guinea Hair Half Harm Having Head Health Heart Heat Heavy " +
    "Height Hence Here Herein High Higher Highly Hill Hind Home Honey Human " +
    "Hunter Hybrid Hyper Image Images Immune Inbred Indeed Infant Info Intact " +
    "Inter Intra Iodine Iran Iron John Joint Jones Joseph Just Kaplan Kappa " +
    "Keep Khan Kidney King Knapp Knee Koch Label Lack Lambda Large Larger " +
    "Larvae Laser Last Lastly Late Lately Later Latest Lead Leaf Leaves Left " +
    "Length Lens Lesion Less Level Levels Lewis Life Ligand Light Like Limb " +
    "Linear Ling Link Lipid Lisa List Little Live Liver Local London Long " +
    "Longer Loss Losses Lower Luke Lumbar Lung Lysine Main Major Male Males " +
    "Mann Manual Many Marc Marcus Marked Market Martin Mass Mature Mean " +
    "Median Medium Mental Meta Metal Method Meyer Mice Middle Mild Milk Minor " +
    "Mixed Mock Mode Model Modern Moles Mono Mood More Most Motor Mouse Much " +
    "Mull Muller Multi Muscle Music Nasal Native Natl Nausea Near Nearly Need " +
    "Needs Neural Never Newer Newly Next Nine Ninety Noise None Nordic Normal " +
    "Note Novel Null Numb Number Nurse Nurses Obese Ocular Odds Older Omega " +
    "Once Only Open Opiate Oral Orsola Other Over Owing Oxygen Ozone Pact " +
    "Pain Paired Paper Parent Paris Part Path Paul Paulo Peak Peer People " +
    "Peter Phase Phil Phys Pilot Plain Plant Plants Plasma Please Policy " +
    "Pooled Poor Port Post Power Prior Proper Proton Public Pulse Pure Pylori " +
    "Random Rank Ransom Rapid Rate Rates Rather Ratio Rats Real Recent Rectal " +
    "Relief Renal Repair Repeat Report Result Review Rich Right Risk Risks " +
    "Road Robert Room Root Roots Rosa Rural Russet Ruth Safety Salt Sample " +
    "Scan Scores Scout Seal Search Season Second Seed Self Semi Senior Serial " +
    "Serous Serum Seven Severe Sexual Shock Shoots Short Side Sight Sigma " +
    "Sign Silver Simon Simple Since Single Site Sixty Skin Slabs Sleep Slight " +
    "Slow Small Smart Smith Snow Soccer Social Sodium Soil Some Source Spec " +
    "Speech Speed Spinal Spleen Sports Spot Stage Stages Starch State Stats " +
    "Steady Stem Step Stern Sterne Still Stone Stop Stress Strict Stroke " +
    "Strong Study Such Sudden Sugar Sulfur Sunday Supp Surf Survey Swiss " +
    "System Table Tables Taken Taking Tandem Target Task Team Tech Tell Test " +
    "Tested Tests Text That Their Then There These They Thin Third Thirty " +
    "This Thomas Those Though Three Thus Time Timing Tissue Today Tonic " +
    "Torque Torr Total Toxic Train Trans Trauma Trends Trial Trials Triple " +
    "True Trunk Tubes Tumor Tumors Twelve Twenty Twin Type Types Ultra Under " +
    "Unlike Until Upon Upper Uptake Urban Urea Urine Used Using Value Values " +
    "Venous Venus Very Vibrio Video Vinyl Viral Virus Visual Viva Volume " +
    "Walter Water Webb Weight Well Wells What When Where Which While Whilst " +
    "White Whole Wide Wild Will With Within Women Work Wound Wright Xhosa " +
    "Young Youth Zinc "
  ).split(' ').toSet

  /** likely_sentence_initial_word: table membership OR length > 6. */
  def likely(icWord: String): Boolean =
    icWord.length > 6 || words.contains(icWord)
}
